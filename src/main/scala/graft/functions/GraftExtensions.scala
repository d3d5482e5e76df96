package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SparkSessionExtensions registering graft's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_minhash(tokens, 128, 42) …")`
  * works next to the Column API. Install with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: expected integer literal argument, got $other")
  }
  private def longArg(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected integer literal argument, got $other")
  }

  /** Coerce a vector argument (array<float>, array<int>, …) to
    * array<double> — the expressions themselves accept only doubles. */
  private def vec(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  private def fn(name: String, usage: String)(builder: FunctionBuilder)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_minhash",
      "graft_minhash(tokens, numHashes[, seed]) - MinHash signature of a token array") {
      case Seq(t)       => MinHashSig(t, 128, 42L)
      case Seq(t, n)    => MinHashSig(t, intArg(n, "graft_minhash"), 42L)
      case Seq(t, n, s) => MinHashSig(t, intArg(n, "graft_minhash"), longArg(s, "graft_minhash"))
      case args => throw new IllegalArgumentException(
        s"graft_minhash expects 1-3 arguments, got ${args.length}")
    })
    ext.injectFunction(fn("graft_simhash",
      "graft_simhash(tokens) - 64-bit SimHash of a token array") {
      case Seq(t) => SimHash64(t)
      case args => throw new IllegalArgumentException(
        s"graft_simhash expects 1 argument, got ${args.length}")
    })
    ext.injectFunction(fn("graft_fingerprint",
      "graft_fingerprint(text[, k]) - min rolling-hash over char k-grams") {
      case Seq(t)    => DocFingerprint(t, 16)
      case Seq(t, k) => DocFingerprint(t, intArg(k, "graft_fingerprint"))
      case args => throw new IllegalArgumentException(
        s"graft_fingerprint expects 1-2 arguments, got ${args.length}")
    })
    ext.injectFunction(fn("graft_dot",
      "graft_dot(a, b) - dot product of two double arrays") {
      case Seq(a, b) => DotProduct(vec(a), vec(b))
      case args => throw new IllegalArgumentException(
        s"graft_dot expects 2 arguments, got ${args.length}")
    })
    ext.injectFunction(fn("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two double arrays") {
      case Seq(a, b) => CosineSim(vec(a), vec(b))
      case args => throw new IllegalArgumentException(
        s"graft_cosine expects 2 arguments, got ${args.length}")
    })
    ext.injectFunction(fn("graft_lsh_bucket",
      "graft_lsh_bucket(vec, numBits[, seed]) - random-hyperplane LSH bucket") {
      case Seq(v, n)    => HyperplaneBucket(vec(v), intArg(n, "graft_lsh_bucket"), 42L)
      case Seq(v, n, s) => HyperplaneBucket(vec(v), intArg(n, "graft_lsh_bucket"), longArg(s, "graft_lsh_bucket"))
      case args => throw new IllegalArgumentException(
        s"graft_lsh_bucket expects 2-3 arguments, got ${args.length}")
    })
    ext.injectFunction(fn("graft_nfc",
      "graft_nfc(text) - Unicode NFC normalization") {
      case Seq(t) => NfcNormalize(t)
      case args => throw new IllegalArgumentException(
        s"graft_nfc expects 1 argument, got ${args.length}")
    })
    ext.injectFunction(fn("graft_dense_normalize",
      "graft_dense_normalize(buckets, weights, dim) - sparse entries to " +
        "dense L2-normalized float[dim]") {
      case Seq(b, w, d) =>
        DenseNormalize(b, Cast(w, ArrayType(DoubleType)),
          intArg(d, "graft_dense_normalize"))
      case args => throw new IllegalArgumentException(
        s"graft_dense_normalize expects 3 arguments, got ${args.length}")
    })
  }
}
