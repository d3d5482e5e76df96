package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Accuracy and mergeability pins for the distinct-count sketch tier.
  * KMV is additionally hash-checked against DuckDB via `q_kmv_distinct`;
  * HLL is engine-specific, so its contract lives entirely here.
  */
class SketchOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sfDir)

  private lazy val exact: Map[String, Long] =
    li.groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("kmvDistinct is exact below k and within KMV error above it") {
    val k = 64
    val est = SketchOps.kmvDistinct(li, "l_returnflag", "l_partkey", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
    est.foreach { case (g, nSeen, e) =>
      val n = exact(g)
      if (n < k) {
        assert(nSeen == n && e == n.toDouble, s"$g: below k must be exact")
      } else {
        assert(nSeen == k)
        // KMV relative error ~ 1/sqrt(k-2); allow 5 sigma
        val relErr = math.abs(e - n) / n
        assert(relErr < 5.0 / math.sqrt(k - 2.0),
          s"$g: est $e vs exact $n (rel err $relErr)")
      }
    }
  }

  test("kmvDistinct is deterministic under repartitioning") {
    val a = SketchOps.kmvDistinct(li, "l_returnflag", "l_partkey")
      .orderBy("l_returnflag").collect().toSeq
    val b = SketchOps.kmvDistinct(li.repartition(13), "l_returnflag", "l_partkey")
      .orderBy("l_returnflag").collect().toSeq
    assert(a == b)
  }

  test("hllDistinct estimates within DataSketches error bounds") {
    val est = SketchOps.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (g, e) =>
      val n = exact(g)
      // lgK=12 -> ~1.6% stddev; allow 5 sigma plus small-count slack
      assert(math.abs(e - n).toDouble / n < 0.09, s"$g: HLL est $e vs exact $n")
    }
  }

  test("HLL sketches merge: union of per-group sketches ~ global distinct") {
    val global = li.agg(countDistinct("l_partkey")).collect()(0).getLong(0)
    val merged = SketchOps.hllUnionAll(li, "l_returnflag", "l_partkey")
      .collect()(0).getLong(0)
    assert(math.abs(merged - global).toDouble / global < 0.09,
      s"union-of-sketches $merged vs exact global $global")
    // mergeability law: union of per-group sketches equals the sketch of
    // the whole column (same lgK), not just approximately the count
    val whole = li.agg(hll_sketch_estimate(
        hll_sketch_agg(col("l_partkey"), lit(12)))).collect()(0).getLong(0)
    assert(merged == whole,
      "HLL union must equal the single-pass sketch estimate")
  }
}
