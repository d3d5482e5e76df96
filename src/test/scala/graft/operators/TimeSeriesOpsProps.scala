package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the hot-key window escapes: over RANDOM
  * series (duplicate timestamps, skewed keys, constant stretches,
  * varying bucket/row-bucket sizes) the decomposed forms must equal
  * their single-pass windows BIT FOR BIT — the exact contract that lets
  * the registered `*_bucketed` queries share the single-pass DuckDB
  * oracles. Spec examples pin chosen corners; these pin the law.
  */
object TimeSeriesOpsProps extends Properties("graft.operators.escapes") {

  private lazy val spark = new graft.SparkSpec {}.spark

  private case class Pt(k: Option[String], tsSec: Option[Long], id: Long,
      v: Double)

  /** Random corpus: few keys (the hot-key regime), second-granular
    * timestamps with collisions, values with repeats (percentile tie
    * paths), and OCCASIONAL null keys / null timestamps — the
    * single-pass window keeps a null-key partition and sorts null ts
    * first, and the decomposed forms must stitch those rows back
    * null-safely — sizes stay small so each sample is one fast local
    * job.
    */
  private val corpusGen: Gen[List[Pt]] = for {
    n <- Gen.choose(2, 120)
    nk <- Gen.choose(1, 3)
    pts <- Gen.listOfN(n, for {
      k <- Gen.frequency(
        9 -> Gen.choose(0, nk - 1).map(i => Option(s"k$i")),
        1 -> Gen.const(Option.empty[String]))
      t <- Gen.frequency(
        9 -> Gen.choose(0L, 50000L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      v <- Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble),
        Gen.choose(-1000.0, 1000.0).map(x => math.rint(x * 100) / 100))
    } yield (k, t, v))
  } yield pts.zipWithIndex.map { case ((k, t, v), i) => Pt(k, t, i.toLong, v) }

  private def toDf(pts: List[Pt]): DataFrame = {
    import spark.implicits._
    pts.map(p => (p.k.orNull,
        p.tsSec.map(s => new Timestamp(s * 1000L)).orNull, p.id, p.v))
      .toDF("k", "ts", "id", "v")
  }

  property("rollingZScoreBucketed == rollingZScore bit for bit") =
    forAll(corpusGen, Gen.choose(2, 12), Gen.oneOf(60L, 3600L, 86400L)) {
      (pts, window, bucketSecs) =>
        val df = toDf(pts)
        def m(out: DataFrame): Map[Long, Option[Any]] =
          out.select("id", "z").collect()
            .map(r => r.getLong(0) -> Option(r.get(1))).toMap
        val single = m(TimeSeriesOps.rollingZScore(
          df, Seq("k"), "ts", "v", Seq("id"), window, out = "z"))
        // rowsPerBucket hugs the window (max carry churn)
        val bucketed = m(TimeSeriesOps.rollingZScoreBucketed(
          df, Seq("k"), "ts", "v", Seq("id"), window, bucketSecs,
          rowsPerBucket = window + 1, out = "z"))
        bucketed == single
    }

  property("madOutliersAgg == madOutliers bit for bit") =
    forAll(corpusGen, Gen.choose(1, 30).map(_ / 10.0)) { (pts, k) =>
      val df = toDf(pts)
      def m(out: DataFrame): Map[Long, (Double, Double)] =
        out.select(col("id"), col("dev"), col("mad")).collect()
          .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      m(TimeSeriesOps.madOutliersAgg(df, Seq("k"), "v", k)) ==
        m(TimeSeriesOps.madOutliers(df, Seq("k"), "v", k))
    }
}
