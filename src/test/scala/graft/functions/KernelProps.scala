package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.impl.{HashImpl, VectorImpl}

/** ScalaCheck property suites over the hash/vector kernels (run by sbt's
  * native scalacheck framework — SURVEY.md §5's "property tests" item).
  */
object KernelProps extends Properties("graft.kernels") {

  private val token: Gen[String] = Gen.choose(1, 12).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaNumChar))
  private val tokens: Gen[List[String]] = Gen.nonEmptyListOf(token)

  private def toks(ts: Seq[String]): ArrayData =
    ArrayData.toArrayData(ts.map(UTF8String.fromString).toArray)

  private def sig(ts: Seq[String], n: Int = 24): Seq[Long] =
    HashImpl.minhash(toks(ts), n, 42L).toLongArray().toSeq

  property("minhash(A ++ B) == elementwise min(minhash(A), minhash(B))") =
    forAll(tokens, tokens) { (a, b) =>
      sig(a ++ b) == sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    }

  property("minhash is order- and duplication-invariant") =
    forAll(tokens) { a =>
      sig(a) == sig(a.reverse) && sig(a) == sig(a ++ a)
    }

  property("simhash is order- and duplication-insensitive on sets") =
    forAll(tokens) { a =>
      // voting counts duplicates, so dedupe first — set semantics
      val s = a.distinct
      HashImpl.simhash(toks(s)) == HashImpl.simhash(toks(s.reverse))
    }

  // the one-pass byte-range shingle kernel must agree exactly with the
  // definitional form: distinct string k-gram shingles, fnv64 each
  private def stringShingleHashes(text: String, k: Int): Seq[Long] = {
    val ts = text.split(" ", -1)
    val m = math.max(ts.length - k, 0) + 1
    (0 until m).map(i => ts.slice(i, i + k).mkString(" "))
      .distinct.map(s => HashImpl.fnv64(UTF8String.fromString(s)))
  }

  private val text: Gen[String] = Gen.listOf(Gen.oneOf(token, Gen.const("")))
    .map(_.mkString(" ")) // includes empty tokens / repeated spaces

  property("shingleHashes == fnv64 over distinct string shingles") =
    forAll(text, Gen.choose(1, 5)) { (t, k) =>
      val fast = HashImpl.shingleHashes(UTF8String.fromString(t), k)
        .toLongArray().toSeq
      Prop(fast == stringShingleHashes(t, k)) :| s"text='$t' k=$k"
    }

  property("minhash/simhash from pre-hashed tokens are bit-identical") =
    forAll(tokens) { a =>
      val s = a.distinct
      val hs = ArrayData.toArrayData(
        s.map(t => HashImpl.fnv64(UTF8String.fromString(t))).toArray)
      HashImpl.minhashFromHashes(hs, 24, 42L).toLongArray().toSeq == sig(s) &&
        HashImpl.simhashFromHashes(hs) == HashImpl.simhash(toks(s))
    }

  property("fingerprint deterministic; equal strings collide") =
    forAll(token, Gen.choose(1, 32)) { (t, k) =>
      val u = UTF8String.fromString(t)
      HashImpl.rollingFingerprint(u, k) == HashImpl.rollingFingerprint(UTF8String.fromString(t), k)
    }

  private val vec: Gen[Array[Double]] = Gen.choose(1, 64).flatMap(n =>
    Gen.listOfN(n, Gen.choose(-10.0, 10.0)).map(_.toArray))

  private def ad(a: Array[Double]): ArrayData = ArrayData.toArrayData(a)

  property("cosine is symmetric and within [-1, 1] (+eps)") =
    forAll(vec) { a =>
      val b = a.map(_ * 0.5 + 1.0)
      val ab = VectorImpl.cosine(ad(a), ad(b))
      val ba = VectorImpl.cosine(ad(b), ad(a))
      ab == ba && ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9
    }

  property("cosine(a, a) == 1 for nonzero a; scale-invariant bucket") =
    forAll(vec.suchThat(_.exists(_ != 0.0))) { a =>
      val self = VectorImpl.cosine(ad(a), ad(a))
      val bucketEq = VectorImpl.hyperplaneBucket(ad(a), 16, 7L) ==
        VectorImpl.hyperplaneBucket(ad(a.map(_ * 3.0)), 16, 7L)
      math.abs(self - 1.0) < 1e-9 && bucketEq
    }

  property("dot is bilinear in the first argument") =
    forAll(vec) { a =>
      val b = a.map(_ + 1.0)
      val lhs = VectorImpl.dot(ad(a.map(_ * 2.0)), ad(b))
      val rhs = 2.0 * VectorImpl.dot(ad(a), ad(b))
      math.abs(lhs - rhs) < 1e-6 * (1.0 + math.abs(rhs))
    }

  // the pairs-of-blocks banding guarantee behind simhashDedupPairs:
  // <= 6 flipped bits leave >= 2 of the 8 byte-blocks untouched, so some
  // C(8,2) block-pair key matches — full candidate recall to Hamming 6
  property("pairs-of-blocks banding catches every pair within Hamming 6") =
    forAll(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(0, 6).flatMap(h => Gen.pick(h, 0 until 64))) { (x, flips) =>
      val y = flips.foldLeft(x)((v, b) => v ^ (1L << b))
      val d = x ^ y
      val untouched = (0 until 8).count(b => ((d >>> (b * 8)) & 0xFFL) == 0L)
      val caught = (for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j))
        .exists { case (i, j) =>
          ((d >>> (i * 8)) & 0xFFL) == 0L && ((d >>> (j * 8)) & 0xFFL) == 0L }
      Prop(caught && untouched >= 2) :| s"d=$d untouched=$untouched"
    }

  // the PPJoin size filter behind ngramJaccardPairs: J >= t implies
  // min(|A|,|B|) >= t * max(|A|,|B|) — the join-time bound never drops a
  // qualifying pair
  property("size filter is safe: J >= t implies size compatibility") =
    forAll(
      Gen.nonEmptyListOf(Gen.choose(0, 50)).map(_.toSet),
      Gen.nonEmptyListOf(Gen.choose(0, 50)).map(_.toSet),
      Gen.choose(0.05, 0.95)) { (a: Set[Int], b: Set[Int], t: Double) =>
      val j = a.intersect(b).size.toDouble / a.union(b).size
      val sizeOk = math.min(a.size, b.size) >= t * math.max(a.size, b.size)
      Prop(j < t || sizeOk) :| s"j=$j t=$t |a|=${a.size} |b|=${b.size}"
    }

  property("jaccard estimate from minhash tracks true jaccard") =
    forAll(Gen.choose(5, 40), Gen.choose(0, 20)) { (shared, extra) =>
      val common = (1 to shared).map(i => s"c$i")
      val a = common ++ (1 to extra).map(i => s"a$i")
      val b = common ++ (1 to extra).map(i => s"b$i")
      val sa = HashImpl.minhash(toks(a), 256, 1L).toLongArray()
      val sb = HashImpl.minhash(toks(b), 256, 1L).toLongArray()
      val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
      val truth = shared.toDouble / (shared + 2 * extra)
      Prop(math.abs(est - truth) < 0.2) :| s"est=$est truth=$truth"
    }
}
