package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  def portableHash32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")
  private def h32(c: Column): Column = portableHash32(c)

  /** Derive (n_seen, kth, est_distinct) from a `__sk` sketch column:
    * with u_k = kth-smallest / 2^32 the estimate is (k-1) / u_k (the
    * classic bottom-k estimator, relative error ~ 1/sqrt(k-2)); a
    * sketch holding fewer than k hashes IS the exact distinct set, so
    * its size is the exact count. IEEE *,/ on exact integers —
    * cross-engine deterministic, unlike engine-native HLLs.
    */
  private def sketchStats(k: Int): Seq[Column] = {
    val sk = col("__sk")
    Seq(
      size(sk).cast("long").as("n_seen"),
      when(size(sk) > 0, element_at(sk, -1)).as("kth"),
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) /
          element_at(sk, -1).cast("double")).as("est_distinct"))
  }

  /** KMV distinct-count estimate per group via the native mergeable
    * bottom-k aggregate ([[graft.functions.KmvSketchAgg]]). Output:
    * group, n_seen (min(k, distinct)), kth (the kth-smallest hash),
    * est_distinct.
    *
    * Null handling (changed when the native aggregate replaced the old
    * window formulation): NULL values are skipped, so a group whose
    * values are all NULL reports n_seen = 0 / est_distinct = 0.0 with a
    * NULL `kth` (the old form counted the null hash as n_seen = 1).
    * `kth` is nullable — NULL exactly when the sketch is empty.
    *
    * Scale shape: the aggregation state is a k-capped ordered set, so
    * the PARTIAL aggregate bounds every task's output to k longs per
    * group and the single shuffle carries kilobyte sketches — never the
    * distinct values themselves. (The previous formulation dedup'd
    * (group, hash) globally first: one extra shuffle moving EVERY
    * distinct hash, the exact cost sketches exist to avoid.)
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(col(groupCol))
      .agg(graft.functions.GraftFunctions
        .kmvSketch(h32(col(valueCol)), k).as("__sk"))
      .select(col(groupCol) +: sketchStats(k): _*)
  }

  /** Merge per-group KMV sketches into one global estimate — bottom-k
    * of the union = bottom-k of the bottom-ks, so unioning per-group
    * (or per-day / per-partition) sketches is LOSSLESS: the merged
    * estimate equals the single-pass sketch of the whole column, the
    * same mergeability law [[hllUnionAll]] provides for HLL.
    */
  def kmvUnionAll(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(col(groupCol))
      .agg(graft.functions.GraftFunctions
        .kmvSketch(h32(col(valueCol)), k).as("__g"))
      .agg(graft.functions.GraftFunctions
        .kmvMerge(col("__g"), k).as("__sk"))
      .select(sketchStats(k): _*)
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

  /** Portable 60-bit uniform hash: first 15 hex digits of md5 as a
    * (always positive) signed long — identical in any md5-bearing
    * engine. 60 bits push hash-collision odds below 1e-9 even at
    * million-row groups, where the 32-bit tier's birthday bound would
    * bite. */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Approximate per-group percentile from a PORTABLE bottom-k-by-hash
    * uniform row sample ([[graft.functions.KmvSampleAgg]] keyed on
    * [[portableHash60]] of a unique row id): the k rows with the
    * smallest key hashes are a deterministic uniform sample, and the
    * exact interpolated percentile of the sampled values estimates the
    * true one with standard error ~ sqrt(p(1-p)/k) in rank. Everything
    * is engine-replayable arithmetic — rank the rows by md5, keep k,
    * interpolate — so unlike [[approxQuantiles]] (GK, Spark-native
    * compaction) this sketch carries a full cross-engine oracle, and
    * unlike it the SAMPLE is reusable for any p after the fact.
    * Scale shape: k-bounded partial state, one shuffle of k pairs per
    * group; groups below k hold every row, making the estimate exact.
    * Output: group, n_sample, p{…} (interpolated estimate, rounded to
    * 6 decimals for cross-engine float stability; null on empty
    * groups).
    */
  def sampledPercentile(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, p: Double, k: Int = 256): DataFrame = {
    require(p >= 0.0 && p <= 1.0, "p must be in [0, 1]")
    require(k >= 2, "k must be >= 2")
    val sk = col("__sk")
    val vals = array_sort(transform(sk, x => x.getField("v")))
    val n = size(sk)
    val rank = lit(p) * (n - 1).cast("double")
    val lo = floor(rank)
    val loIdx = lo.cast("int") + 1
    val hiIdx = least(loIdx + 1, n)
    val est = element_at(vals, loIdx) +
      (element_at(vals, hiIdx) - element_at(vals, loIdx)) * (rank - lo)
    val pName = "p" + math.round(p * 100)
    // drop null values BEFORE grouping: a group whose values are all
    // NULL is omitted entirely (matching `WHERE value IS NOT NULL`
    // oracle semantics), never emitted as (group, 0, null)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.GraftFunctions.kmvSample(
        portableHash60(col(idCol)), col(valueCol).cast("double"), k).as("__sk"))
      .select(col(groupCol), n.cast("long").as("n_sample"),
        when(n > 0, round(est, 6)).as(pName))
  }

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
