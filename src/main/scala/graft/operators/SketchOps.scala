package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketches for cardinality estimation at corpus scale —
  * the "how many unique users / tokens / shingles" questions where an
  * exact COUNT(DISTINCT) shuffles every distinct value and a sketch
  * shuffles kilobytes. Two tiers:
  *
  *  - [[kmvDistinct]]: a PORTABLE KMV (k-minimum-values / bottom-k)
  *    sketch built from md5 — deterministic and reproducible bit-for-bit
  *    in any engine with md5 (the repo's oracle-exactness convention;
  *    estimates hash-match DuckDB running the same arithmetic).
  *  - [[hllDistinct]]: Spark's native DataSketches HLL surface
  *    (`hll_sketch_agg`), the production path — mergeable binary
  *    sketches, unionable across partitions/days (pinned in
  *    SketchOpsSpec; engine-specific, so its query is rows-only).
  *
  * No reference analogue (the reference's Aggregate enum never executes,
  * expression.go:17-20) — extension tier, shaped for 100 TB.
  */
object SketchOps {

  /** Portable uniform 32-bit hash: first 8 hex digits of md5, read as an
    * unsigned 32-bit value. Identical in Spark, DuckDB, Postgres.
    */
  private def h32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** KMV distinct-count estimate per group: keep the `k` smallest
    * distinct hash values; with u_k = kth-smallest / 2^32 the estimate
    * is (k-1) / u_k (the classic bottom-k estimator, relative error
    * ~ 1/sqrt(k-2)); groups with fewer than k distinct hashes report
    * the exact count. Output: group, n_seen (min(k, distinct)), kth
    * (the kth hash), est_distinct.
    *
    * Scale shape: the per-group distinct dedups map-side (partial
    * aggregate), then one shuffle on the group key; the rank<=k filter
    * is a WindowGroupLimit in the physical plan — per-partition top-k
    * heaps, never a full per-group sort/materialization. Estimation
    * arithmetic is IEEE *,/ on exact integers — cross-engine
    * deterministic, unlike engine-native HLLs.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val hashes = df.select(col(groupCol), h32(col(valueCol)).as("__h")).distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__h"))
    hashes.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_seen"), max(col("__h")).as("kth"))
      .withColumn("est_distinct",
        when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
            col("kth").cast("double")))
      .select(col(groupCol), col("n_seen"), col("kth"), col("est_distinct"))
  }

  /** Native DataSketches HLL estimate per group — the mergeable
    * production sketch (union sketches across partitions, days, or
    * engines that speak the DataSketches format). `lgK` trades size for
    * accuracy (~1.04/sqrt(2^lgK) relative error).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol), lit(lgK))).as("est_distinct"))

  /** Merge per-group HLL sketches into one global estimate — the
    * mergeability that makes sketches the 100 TB answer: per-day/
    * per-partition sketches union in bytes, no re-scan.
    */
  def hllUnionAll(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("__sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("est_distinct"))

  /** Approximate per-group quantiles via Spark's Greenwald–Khanna
    * summary (`percentile_approx`) — the single-pass, partial-agg'd
    * (map-side combined) quantile tier next to the exact interpolated
    * `percentile` (which needs the whole group, `ts_window_stats`).
    * Guarantees a RANK error ≤ 1/accuracy — each returned value is an
    * actual element of the group whose rank is within n/accuracy of the
    * target — and is deterministic (GK compaction has no randomness),
    * unlike sampled sketches. One shuffle; state per group is
    * O(accuracy · log n) regardless of group size, so a skewed 100 TB
    * group never materializes.
    */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      probs: Seq[Double], accuracy: Int = 1000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "probabilities must be in [0, 1]")
    df.groupBy(col(groupCol))
      .agg(
        percentile_approx(col(valueCol),
          array(probs.map(lit): _*), lit(accuracy)).as("quantiles"),
        count(col(valueCol)).as("n"))
  }
}
