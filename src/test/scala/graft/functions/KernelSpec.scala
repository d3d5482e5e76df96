package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.impl.{HashImpl, VectorImpl}

/** Pure-JVM properties of the hash/vector kernels (no SparkSession). */
class KernelSpec extends AnyFunSuite {

  private def toks(ts: String*): ArrayData =
    ArrayData.toArrayData(ts.map(UTF8String.fromString).toArray)

  private def sig(a: ArrayData, n: Int = 32): Seq[Long] =
    HashImpl.minhash(a, n, 42L).toLongArray().toSeq

  test("fnv64 is deterministic and spreads") {
    val h1 = HashImpl.fnv64(UTF8String.fromString("hello"))
    assert(h1 == HashImpl.fnv64(UTF8String.fromString("hello")))
    assert(h1 != HashImpl.fnv64(UTF8String.fromString("hellp")))
  }

  test("minhash signature of a union is the elementwise min of signatures") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val a = List.fill(1 + rnd.nextInt(20))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val b = List.fill(1 + rnd.nextInt(20))(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      val sa = sig(toks(a: _*))
      val sb = sig(toks(b: _*))
      val su = sig(toks(a ++ b: _*))
      assert(su == sa.zip(sb).map { case (x, y) => math.min(x, y) })
    }
  }

  test("minhash jaccard estimate is close on a known pair") {
    // |A∩B|=9, |A∪B|=11 → J≈0.818; 256 hashes → stderr ≈ 0.024
    val shared = (1 to 9).map(i => s"tok$i")
    val a = toks(shared :+ "onlyA": _*)
    val b = toks(shared :+ "onlyB": _*)
    val sa = HashImpl.minhash(a, 256, 42L).toLongArray()
    val sb = HashImpl.minhash(b, 256, 42L).toLongArray()
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 9.0 / 11.0) < 0.1)
  }

  test("simhash: equal token sets collide, disjoint sets are far") {
    val a = toks("alpha beta", "beta gamma", "gamma delta")
    val b = toks("alpha beta", "beta gamma", "gamma delta")
    assert(HashImpl.simhash(a) == HashImpl.simhash(b))
    val c = toks("zeta eta", "eta theta", "theta iota")
    val ham = java.lang.Long.bitCount(HashImpl.simhash(a) ^ HashImpl.simhash(c))
    assert(ham > 10, s"disjoint sets should be far apart, got Hamming $ham")
  }

  test("rollingFingerprint: deterministic, text-sensitive, short-text safe") {
    val t = UTF8String.fromString("the quick brown fox jumps over the lazy dog")
    assert(HashImpl.rollingFingerprint(t, 16) == HashImpl.rollingFingerprint(t, 16))
    val t2 = UTF8String.fromString("the quick brown fox jumps over the lazy cat")
    assert(HashImpl.rollingFingerprint(t, 16) != HashImpl.rollingFingerprint(t2, 16))
    // shorter than k: hashes the whole string, no crash
    val s = UTF8String.fromString("hi")
    assert(HashImpl.rollingFingerprint(s, 16) == HashImpl.rollingFingerprint(s, 16))
    assert(HashImpl.rollingFingerprint(UTF8String.fromString(""), 16) == 0L)
  }

  private def vec(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)

  test("vector kernels: dot, norm, cosine basics") {
    assert(VectorImpl.dot(vec(1, 2, 3), vec(4, 5, 6)) == 32.0)
    assert(VectorImpl.cosine(vec(1, 0), vec(0, 1)) == 0.0)
    assert(math.abs(VectorImpl.cosine(vec(2, 2), vec(5, 5)) - 1.0) < 1e-12)
    assert(VectorImpl.cosine(vec(0, 0), vec(1, 1)) == 0.0) // zero-vector guard
  }

  test("cosine matches a naive reference on random-ish vectors") {
    val a = (1 to 64).map(i => math.sin(i.toDouble)).toArray
    val b = (1 to 64).map(i => math.cos(i * 0.7)).toArray
    val naiveDot = a.zip(b).map { case (x, y) => x * y }.sum
    val naive = naiveDot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val got = VectorImpl.cosine(ArrayData.toArrayData(a), ArrayData.toArrayData(b))
    assert(math.abs(got - naive) < 1e-12)
  }

  test("hyperplaneBucket: deterministic, seed-sensitive, respects numBits") {
    val v = vec(0.3, -1.2, 0.8, 2.1)
    val b1 = VectorImpl.hyperplaneBucket(v, 16, 7L)
    assert(b1 == VectorImpl.hyperplaneBucket(v, 16, 7L))
    assert(b1 >= 0 && b1 < (1L << 16))
    // scaling a vector doesn't change its sign pattern
    val scaled = vec(0.6, -2.4, 1.6, 4.2)
    assert(b1 == VectorImpl.hyperplaneBucket(scaled, 16, 7L))
  }
}
