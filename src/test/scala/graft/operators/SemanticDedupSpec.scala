package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** SemDeDup cluster-blocked dedup: exactness within shared clusters,
  * full recall on a corpus whose near-dups ARE semantically clustered,
  * determinism, and the subset contract vs the exact all-pairs form.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: `nc` well-separated cluster directions in `dim`
  // dims (unit axes — mutual cosine 0), `per` members each = direction
  // + small deterministic jitter, so same-cluster cosine ≈ 1 and
  // cross-cluster cosine ≈ 0. Near-dup pairs are exactly the
  // within-cluster pairs.
  private def planted(nc: Int, per: Int, dim: Int) = {
    val rows = for {
      c <- 0 until nc
      m <- 0 until per
    } yield {
      val v = Array.tabulate(dim) { d =>
        val base = if (d == c) 1.0 else 0.0
        // deterministic jitter, small vs the unit direction
        base + 0.05 * math.sin(1.0 + c * 131 + m * 17 + d * 7)
      }
      (c.toLong * per + m, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("planted clusters: semantic pairs == exact all-pairs (full recall)") {
    val df = planted(nc = 6, per = 8, dim = 16)
    val exact = TextDedupOps
      .embeddingDedupPairs(df, "vec_id", "embedding", 0.8, numBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted corpus must contain near-dup pairs")
    val sem = SemanticDedupOps
      .semanticDedupPairs(df, "vec_id", "embedding", 0.8,
        k = 6, probes = 1, iters = 4, numBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem == exact,
      s"k-means blocking must keep every planted pair: missing ${exact -- sem}")
  }

  test("embeddingDedupPairs refuses corpus-scale input loudly; 0 forces") {
    val df = planted(nc = 2, per = 3, dim = 8)
    // a 1-byte budget trips the guard on any real input — the message
    // names the scale paths and the deliberate-override knob
    val ex = intercept[IllegalArgumentException](TextDedupOps
      .embeddingDedupPairs(df, "vec_id", "embedding", 0.8,
        maxInputBytes = 1L))
    assert(ex.getMessage.contains("quadratic") &&
      ex.getMessage.contains("semanticDedup") &&
      ex.getMessage.contains("maxInputBytes = 0"))
    // maxInputBytes = 0 disables the guard (the considered-choice path)
    assert(TextDedupOps.embeddingDedupPairs(df, "vec_id", "embedding",
      0.8, maxInputBytes = 0L).count() ==
      TextDedupOps.embeddingDedupPairsNaive(df, "vec_id", "embedding",
        0.8).count())
  }

  test("subset contract: semantic pairs are always a subset of all-pairs, cos identical") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = TextDedupOps
      .embeddingDedupPairs(e, "vec_id", "embedding", 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sem = SemanticDedupOps
      .semanticDedupPairs(e, "vec_id", "embedding", 0.4, k = 8, probes = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(sem.nonEmpty)
    sem.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"$pair not in the exact pair set")
      assert(exact(pair) == cos, s"$pair cos must match the exact kernel")
    }
    // no duplicate pairs even when rows share several probed clusters
    assert(sem.map(_._1).distinct.length == sem.length)
  }

  test("deterministic under repartitioning; block grid does not change output") {
    val e = Tables.embeddings(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame, blocks: Int) =
      SemanticDedupOps.semanticDedupPairs(df, "vec_id", "embedding", 0.4,
          k = 8, probes = 2, numBlocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = run(e, 4)
    val b = run(e.repartition(7), 9)
    assert(a == b)
  }

  test("trainCentroids: deterministic, normalized, k x dim") {
    val e = Tables.embeddings(spark, sfDir)
    val c1 = SemanticDedupOps.trainCentroids(e, "vec_id", "embedding", 5, iters = 2)
    val c2 = SemanticDedupOps.trainCentroids(e, "vec_id", "embedding", 5, iters = 2)
    assert(c1.length == 5)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    c1.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("non-integral id is rejected") {
    val df = Seq(("a", Array(1.0, 0.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      SemanticDedupOps.semanticDedupPairs(df, "vec_id", "embedding", 0.8)
    }
  }
}
