package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators — the "rich set of time-series functions"
  * the reference's README names as its goal (README.md:8) but never
  * built. All are composed from stock Spark operators so Catalyst/AQE
  * plan them (SURVEY.md §2.5, §7.2 step 4); none needs a custom
  * physical node.
  *
  * Scale notes: every operator here is one shuffle on its natural key
  * (the series/by-key), which is the minimum any engine needs for these
  * semantics. Nothing collects to the driver; skewed by-keys are handled
  * by AQE skew-join/partition-coalescing at runtime.
  */
object TimeSeriesOps {

  /** Backward as-of join (inclusive): for each left row, the most recent
    * right row with `right.ts <= left.ts` and equal by-keys; unmatched
    * left rows keep nulls (left-join semantics).
    *
    * This is the deterministic generalization of the reference's
    * positional multi-series zip (executor.go:857-868, SURVEY.md §2.3 J4).
    *
    * Implementation: union both sides tagged with a side marker, one
    * window partitioned by the by-keys ordered by (ts, side) — right rows
    * sort before left rows at equal ts, so equal-ts matches are included
    * — then `last(col, ignoreNulls)` carries each right column forward.
    * One shuffle total, no per-row lookups, no broadcast requirement:
    * at 100 TB this beats a range-join (O(n·m) per key) and works for
    * arbitrarily large both sides.
    *
    * @param rightCols right columns to carry; they appear as
    *                  `{prefix}{col}` on the output
    * @param toleranceMicros if set, matches farther than this many
    *                  microseconds from left.ts are nulled out
    * @param direction "backward" (default): latest right row at or
    *                  before left.ts — the reference's merge-iterator
    *                  implicit (boostseriesiterator.go:300-342);
    *                  "forward": earliest right row at or after left.ts;
    *                  "nearest": whichever of the two candidates sits
    *                  closer in time (ties prefer backward). Backward
    *                  and forward are one-window one-shuffle plans;
    *                  nearest runs BOTH window passes over the same
    *                  hash partitioning (one exchange, two sorts) and
    *                  picks per row — still no join node, no broadcast
    *                  requirement.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      tsCol: String,
      rightCols: Seq[String],
      prefix: String = "asof_",
      toleranceMicros: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward, forward or nearest, got $direction")
    val side = "__graft_side"
    val rts = s"${prefix}ts"
    val r = right.select(
      (by.map(col) :+ col(tsCol)) ++ rightCols.map(c => col(c).as(s"$prefix$c")): _*)
      .withColumn(rts, col(tsCol))
      .withColumn(side, lit(0))
    val l = left.withColumn(side, lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // backward scans time ascending so `last` carries the latest right
    // row <= left.ts; forward scans descending so it carries the
    // earliest right row >= left.ts. Right rows (side 0) sort before
    // left rows at equal ts in both orders — at-or-before/at-or-after.
    def winFor(dir: String) = {
      val tsOrder = if (dir == "backward") col(tsCol).asc else col(tsCol).desc
      Window.partitionBy(by.map(col): _*)
        .orderBy(tsOrder, col(side).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val carryCols = rightCols.map(c => s"$prefix$c") :+ rts

    if (direction != "nearest") {
      val w = winFor(direction)
      val carried = carryCols
        .foldLeft(unioned)((df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      val joined = carried.filter(col(side) === 1).drop(side)
      val bounded = toleranceMicros match {
        case None => joined
        case Some(tol) =>
          val gap =
            if (direction == "backward")
              unix_micros(col(tsCol)) - unix_micros(col(rts))
            else unix_micros(col(rts)) - unix_micros(col(tsCol))
          val inTol = gap <= lit(tol)
          rightCols.map(c => s"$prefix$c").foldLeft(joined)((df, c) =>
            df.withColumn(c, when(inTol, col(c))))
            .withColumn(rts, when(inTol, col(rts)))
      }
      bounded.drop(rts)
    } else {
      // nearest: carry both directional candidates, then choose the
      // closer one per row. Tolerance disqualifies a direction before
      // the choice, so a too-far backward match loses to an in-range
      // forward one (and vice versa); neither in range → null → the
      // caller's inner filter drops the row.
      val (wB, wF) = (winFor("backward"), winFor("forward"))
      val both = carryCols.foldLeft(unioned)((df, c) =>
        df.withColumn(s"__b_$c", last(col(c), ignoreNulls = true).over(wB))
          .withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(wF)))
      val joined = both.filter(col(side) === 1).drop(side)
      val (bts, fts) = (col(s"__b_$rts"), col(s"__f_$rts"))
      val gapB = unix_micros(col(tsCol)) - unix_micros(bts)
      val gapF = unix_micros(fts) - unix_micros(col(tsCol))
      def inTol(gap: Column): Column =
        toleranceMicros.map(t => gap <= lit(t)).getOrElse(lit(true))
      val bOk = bts.isNotNull && inTol(gapB)
      val fOk = fts.isNotNull && inTol(gapF)
      val useB = bOk && (!fOk || gapB <= gapF) // tie prefers backward
      val chosen = carryCols.foldLeft(joined)((df, c) =>
        df.withColumn(c, when(useB, col(s"__b_$c")).when(fOk, col(s"__f_$c"))))
      chosen.drop(carryCols.flatMap(c => Seq(s"__b_$c", s"__f_$c")): _*)
        .drop(rts)
    }
  }

  /** Per-key difference between consecutive points:
    * `value - lag(value)` over (partition by keys order by ts, tieBreak).
    * First point per key yields null.
    */
  def delta(df: DataFrame, by: Seq[String], tsCol: String, valCol: String,
      tieBreak: Seq[String], out: String = "delta"): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    df.withColumn(out, col(valCol) - lag(col(valCol), 1).over(w))
  }

  /** Rolling z-score anomaly signal: `(v - mean) / stddev` over the
    * trailing `window` rows per key (ROWS frame — exact SQL window
    * semantics, a narrow single-pass per sorted partition at any
    * scale). Rounded to 6 decimals so the value is engine-portable
    * (double accumulation order differs across engines); windows with
    * zero dispersion yield null — no anomaly signal on a flat series.
    */
  /** MAD outliers: robust per-key anomaly flags. A point is an outlier
    * when |v − median| > k · MAD, where MAD is the median absolute
    * deviation median(|v − median|) — the robust dispersion measure
    * that, unlike the z-score's mean/stddev, is not itself dragged by
    * the outliers it is hunting (one wild point shifts a mean; it
    * cannot shift a median).
    *
    * Both medians are exact interpolated percentiles computed as WINDOW
    * aggregates over the same per-key partition, so Catalyst plans ONE
    * exchange with two window passes — never a self-join against a
    * per-key medians table. At 100 TB the cost is the one per-key
    * shuffle every per-series operator pays. Emits `dev` (|v − median|)
    * and `mad` alongside the surviving rows; all-constant keys have
    * MAD 0 and flag nothing (dev > k·0 requires dev > 0 ... every
    * deviating point of a constant-majority key IS the anomaly).
    */
  def madOutliers(df: DataFrame, by: Seq[String], valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(by.map(col): _*)
    val med = expr(s"percentile($valCol, 0.5)").over(w)
    df.withColumn("__med", med)
      .withColumn("dev", abs(col(valCol) - col("__med")))
      .withColumn("mad", expr("percentile(dev, 0.5)").over(w))
      .filter(col("dev") > lit(k) * col("mad"))
      .drop("__med")
  }

  /** Aggregate-then-broadcast decomposition of [[madOutliers]] — the
    * hot-key escape for the ORDER-STATISTIC tier. A median does NOT
    * stitch over time buckets (unlike twa/ewma's linear recurrences),
    * so the decomposition is in VALUE space instead: the per-key median
    * as a `groupBy` AGGREGATE — Spark's `percentile` buffers a
    * value→count map, so the map-side PARTIAL aggregation parallelizes
    * the scan over every task and the one sequential step per key is
    * merging count maps sized by DISTINCT values, not rows (the exact
    * analogue of twa's phase-2 bucket-summary scan) — then a broadcast
    * join pins the medians back onto the rows with NO row shuffle at
    * all. The whole-partition WINDOW form shuffles and sorts every row
    * of a key into one task; this form never moves a data row.
    *
    * Cost: two scan passes (median, then the deviation median) instead
    * of one sorted shuffle — at 100 TB two parallel scans beat one
    * serialized sort on a 5-key corpus by the core count. Regime: this
    * is the LOW-cardinality hot-key escape (the medians table must fit
    * a broadcast); at high key cardinality the window form's
    * parallelism equals |keys| and is already fine — use it there. Results are
    * BIT-IDENTICAL to [[madOutliers]]: the window and aggregate forms
    * run the same Percentile aggregate (count-map merge is order-
    * insensitive; the final rank walk sorts by value), and the
    * broadcast join is null-safe on the by-keys so null-key groups
    * match the window form's partitioning. Output columns: by-keys
    * first (join layout), then the remaining input columns, `dev`,
    * `mad`.
    */
  def madOutliersAgg(df: DataFrame, by: Seq[String], valCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be positive")
    def pinBack(rows: DataFrame, perKey: DataFrame): DataFrame = {
      val renamed = perKey.select(perKey.columns.map(c =>
        if (by.contains(c)) col(c).as(s"__k_$c") else col(c)): _*)
      val cond = by.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
      rows.join(broadcast(renamed), cond)
        .drop(by.map(c => s"__k_$c"): _*)
    }
    val med = df.groupBy(by.map(col): _*)
      .agg(expr(s"percentile($valCol, 0.5)").as("__med"))
    val withDev = pinBack(df, med)
      .withColumn("dev", abs(col(valCol) - col("__med")))
    val mad = withDev.groupBy(by.map(col): _*)
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    pinBack(withDev, mad)
      .filter(col("dev") > lit(k) * col("mad"))
      .drop("__med")
  }

  def rollingZScore(df: DataFrame, by: Seq[String], tsCol: String,
      valCol: String, tieBreak: Seq[String], window: Int = 20,
      out: String = "zscore"): DataFrame = {
    require(window > 1, "window must cover at least 2 rows")
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
      .rowsBetween(-(window - 1).toLong, Window.currentRow)
    val mu = avg(col(valCol)).over(w)
    val sd = stddev_samp(col(valCol)).over(w)
    df.withColumn(out, when(sd > 0, round((col(valCol) - mu) / sd, 6)))
  }

  /** Two-phase bucket-then-stitch [[rollingZScore]] — the hot-key escape
    * for the trailing-ROWS window tier (the same failure shape the skew
    * artifact measures for twa/ewma: a window partitioned by the key
    * alone serializes one task per key, so 5 distinct keys cap the
    * parallelism at 5 however many cores exist). The trailing window is
    * over ROWS, so the decomposition works in ROW space:
    *
    *  - phase 1 (parallel per (key, time-bucket)): in-bucket row numbers
    *    via a (key, bucket)-partitioned window — a hot key fans out over
    *    its time buckets;
    *  - phase 2 (bucket-summary-sized): per-(key, bucket) counts prefix-
    *    summed per key give each bucket's global row offset; joining it
    *    back yields the GLOBAL per-key row number rn without ever
    *    sorting a whole key in one task (time-bucket floor is monotone
    *    in ts, so rn order ≡ the single-pass (ts, tieBreak) order);
    *  - phase 3 (parallel per (key, row-bucket)): rows regroup into
    *    fixed-size ROW buckets of `rowsPerBucket`; each row whose
    *    trailing window is needed by the NEXT row bucket's head (the
    *    last window−1 rows) is DUPLICATED into it as a carry row, so
    *    every row's trailing `window` ROWS are physically present in its
    *    partition; the same avg/stddev_samp frame as the single-pass
    *    form then evaluates over the identical rows in the identical
    *    order — BIT-IDENTICAL output (carry rows compute and are
    *    dropped) — with parallelism keys × (rows / rowsPerBucket).
    *
    * The carry crosses at most one bucket boundary because
    * `rowsPerBucket >= window` (required). Output = input columns +
    * `out`, exactly [[rollingZScore]].
    */
  def rollingZScoreBucketed(df: DataFrame, by: Seq[String], tsCol: String,
      valCol: String, tieBreak: Seq[String], window: Int = 20,
      bucketSeconds: Long = 86400L, rowsPerBucket: Int = 8192,
      out: String = "zscore"): DataFrame = {
    require(window > 1, "window must cover at least 2 rows")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(rowsPerBucket >= window,
      "rowsPerBucket must be >= window so a trailing frame crosses at " +
        "most one row-bucket boundary")
    val keyCols = by.map(col)
    val u = unix_micros(col(tsCol))
    val withTbk = df.withColumn("__tbk",
      u - pmod(u, lit(bucketSeconds * 1000000L)))
    // phase 1: in-bucket row numbers — parallel per (key, time-bucket)
    val wIn = Window.partitionBy((by :+ "__tbk").map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    val withIrn = withTbk.withColumn("__irn",
      row_number().over(wIn).cast("long"))
    // phase 2: per-key bucket offsets over the SUMMARY table only
    val counts = withTbk.groupBy((by :+ "__tbk").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val wPre = Window.partitionBy(keyCols: _*).orderBy(col("__tbk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wPre), lit(0L)))
      .select((by :+ "__tbk").map(c => col(c).as(s"__k_$c")) :+ col("__off"): _*)
    // null-safe equality on the stitch keys (like madOutliersAgg's
    // pinBack): a USING join would silently drop null by-keys / null ts
    // rows that the single-pass window form keeps as their own
    // partition — breaking the BIT-IDENTICAL contract
    val stitchCond = (by :+ "__tbk")
      .map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    val withRn = withIrn.join(offs, stitchCond)
      .drop((by :+ "__tbk").map(c => s"__k_$c"): _*)
      .withColumn("__rn", col("__off") + col("__irn"))
    // phase 3: fixed-size row buckets + boundary carry
    val bkOf = floor((col("__rn") - 1L) / lit(rowsPerBucket.toLong))
    val carryBk =
      floor((col("__rn") - 1L + lit((window - 1).toLong)) /
        lit(rowsPerBucket.toLong))
    val own = withRn.withColumn("__rbk", bkOf)
      .withColumn("__carry", lit(false))
    val carried = withRn.withColumn("__rbk", carryBk)
      .filter(carryBk =!= bkOf)
      .withColumn("__carry", lit(true))
    val wz = Window.partitionBy((keyCols :+ col("__rbk")): _*)
      .orderBy(col("__rn").asc)
      .rowsBetween(-(window - 1).toLong, Window.currentRow)
    val mu = avg(col(valCol)).over(wz)
    val sd = stddev_samp(col(valCol)).over(wz)
    own.unionByName(carried)
      .withColumn(out, when(sd > 0, round((col(valCol) - mu) / sd, 6)))
      .filter(!col("__carry"))
      .drop("__tbk", "__irn", "__off", "__rn", "__rbk", "__carry")
  }

  /** LTTB downsampling (Steinarsson 2013, "Largest-Triangle-Three-
    * Buckets" — the Grafana/Timescale chart downsampler), in the
    * PARALLEL neighbor-average variant: per (key, time-bucket) keep the
    * ONE point forming the largest triangle with the PREVIOUS and NEXT
    * buckets' average points. Classic LTTB anchors the triangle on the
    * previously SELECTED point — a sequential chain no distributed plan
    * can honor; anchoring on the neighbor averages (the same
    * approximation several engines ship for exactly this reason)
    * decouples the buckets: two narrow window passes over the
    * bucket-aggregate table plus one equi-join, every stage parallel.
    * The first and last buckets emit their first/last POINT (the
    * classic endpoint anchors). Deterministic: exact decimal/integer
    * sums inside the averages (double summation order would differ
    * across partitionings) and total tie orders on every pick.
    *
    * Output: by-keys, `bucket`, tsCol, valCol — ≤1 point per bucket,
    * EXCEPT a key whose data spans a single bucket: that bucket is both
    * endpoint anchors, so it emits the first AND last point (2 when
    * they differ — the whole series reduced to its endpoints, matching
    * classic LTTB's always-keep-both-endpoints contract; pinned in
    * spec).
    *
    * 100 TB: the bucket-aggregate table A is |buckets| rows (~1/per-
    * bucket-count of the input); points shuffle ONCE on (key, bucket)
    * for the join, and the pick aggregate reuses that partitioning.
    * NULL values are excluded (they cannot anchor a triangle).
    */
  def lttbDownsample(df: DataFrame, by: Seq[String], tsCol: String,
      valCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val keyCols = by.map(col)
    val pts = df
      .filter(col(valCol).isNotNull)
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("bucket", expr(s"__t div ${bucketSeconds * 1000000L}"))
    // exact-sum averages: micros sums in decimal(38,0) (a day of micros
    // times a billion rows overflows int64), values in decimal(18,2)
    // (the corpus's native precision) — identical doubles in any engine
    val aggA = pts.groupBy((keyCols :+ col("bucket")): _*)
      .agg((sum(col("__t").cast("decimal(38,0)")).cast("double") /
              count(lit(1))).as("avg_t"),
        (sum(col(valCol).cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("avg_v"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(keyCols: _*)
    val a2 = aggA
      .withColumn("__pt", lag(col("avg_t"), 1).over(wOrd))
      .withColumn("__pv", lag(col("avg_v"), 1).over(wOrd))
      .withColumn("__nt", lead(col("avg_t"), 1).over(wOrd))
      .withColumn("__nv", lead(col("avg_v"), 1).over(wOrd))
      .withColumn("__bmin", min(col("bucket")).over(wAll))
      .withColumn("__bmax", max(col("bucket")).over(wAll))
      .drop("avg_t", "avg_v")
    val j = pts.join(a2, by :+ "bucket")
    val v = col(valCol).cast("double")
    val area = abs((col("__pt") - col("__nt")) * (v - col("__pv")) -
      (col("__pt") - col("__t")) * (col("__nv") - col("__pv")))
    val pt = struct(col("__t").as("t"), v.as("v"))
    val isFirst = col("bucket") === col("__bmin")
    val isLast = col("bucket") === col("__bmax")
    val isMid = !isFirst && !isLast
    val picked = j.groupBy((keyCols :+ col("bucket")): _*)
      .agg(min(when(isFirst, pt)).as("__f"),
        max(when(isLast, pt)).as("__l"),
        max(when(isMid, struct(area.as("a"), (-col("__t")).as("nt"), pt.as("p"))))
          .getField("p").as("__m"))
    picked
      .select((keyCols :+ col("bucket") :+ explode(array_distinct(filter(
        array(col("__f"), col("__l"), col("__m")), _.isNotNull))).as("__pick")): _*)
      .select((keyCols :+ col("bucket") :+
        timestamp_micros(col("__pick.t")).as(tsCol) :+
        col("__pick.v").as(valCol)): _*)
  }

  /** M4 downsampling (Jugel et al., VLDB 2014 "M4: A Visualization-
    * Oriented Time Series Data Aggregation"): per (key, time-bucket)
    * keep at most the 4 points that determine an error-free min/max
    * line rendering — first and last by time, minimum and maximum by
    * value. The standard width-parameterized downsampler for charting
    * a billion-point series at pixel resolution.
    *
    * All four ranks share the (key, bucket) partitioning, so Catalyst
    * plans ONE exchange with per-ordering sorts; deterministic via the
    * `tieBreak` columns (every rank is a total order). A point that is
    * several extremes at once (e.g. first AND min) is emitted once.
    */
  def m4Downsample(df: DataFrame, by: Seq[String], tsCol: String,
      valCol: String, tieBreak: Seq[String], bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val d = df
      .withColumn("__ts_us", unix_micros(col(tsCol)))
      .withColumn("bucket", expr(s"__ts_us div ${bucketSeconds * 1000000L}"))
    val part = (by :+ "bucket").map(col)
    val tie = tieBreak.map(col)
    def rk(order: Column*) =
      row_number().over(Window.partitionBy(part: _*).orderBy(order: _*))
    val firstRk = rk((col("__ts_us").asc +: tie.map(_.asc)): _*)
    val lastRk  = rk((col("__ts_us").desc +: tie.map(_.desc)): _*)
    val minRk   = rk((col(valCol).asc +: (col("__ts_us").asc +: tie.map(_.asc))): _*)
    val maxRk   = rk((col(valCol).desc +: (col("__ts_us").desc +: tie.map(_.desc))): _*)
    d.withColumn("__keep",
        firstRk === 1 || lastRk === 1 || minRk === 1 || maxRk === 1)
      .filter(col("__keep"))
      .select((by.map(col) :+ col("bucket") :+ col(tsCol) :+ col(valCol)): _*)
      .distinct()
  }

  /** Per-key rate of change per second between consecutive points. */
  def rate(df: DataFrame, by: Seq[String], tsCol: String, valCol: String,
      tieBreak: Seq[String], out: String = "rate"): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    val dv = col(valCol) - lag(col(valCol), 1).over(w)
    val dtMicros = unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w)
    df.withColumn(out, when(dtMicros > 0, dv / (dtMicros.cast("double") / 1e6)))
  }

  /** Sessionize: split each key's event stream into sessions wherever
    * the gap to the previous event exceeds `gapSeconds`. session_id is
    * the running count of gap-breaks (0-based per key) — the standard
    * lag + cumulative-sum formulation, one shuffle on the by-key.
    */
  def sessionize(df: DataFrame, by: Seq[String], tsCol: String,
      tieBreak: Seq[String], gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    val gapMicros = unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w)
    val isBreak = when(gapMicros.isNull, lit(0))
      .when(gapMicros > gapSeconds * 1000000L, lit(1)).otherwise(lit(0))
    df.withColumn("session_id",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered funnel conversion: for each user, the earliest time each
    * step was reached STRICTLY AFTER the previous step (the classic
    * product-analytics funnel — "signed up, then viewed, then clicked,
    * then purchased, in that order"), counted per step. A user advances
    * to step i only via an event of `steps(i)` with a timestamp later
    * than their step i−1 time; `withinMicros` additionally bounds the
    * whole journey to that many microseconds from the step-0 time.
    *
    * Plan shape: ONE hash exchange on the user key. Each step's
    * first-reach time is a whole-partition `min(CASE …)` window over
    * the same partitioning — step i's condition references step i−1's
    * materialized column, so Catalyst stacks k Window nodes on one
    * exchange (dependent expressions cannot collapse into one node,
    * but they re-use the partitioning and sort nothing). The per-user
    * reduction and the final per-step counts aggregate over the same
    * key, so at 100 TB the cost is the one per-user shuffle any
    * sessionization pays, then a k-column count.
    *
    * Returns one row per step: (step_index, step, users), ordered —
    * users is monotonically non-increasing down the funnel by
    * construction.
    */
  def funnel(df: DataFrame, userCol: String, eventCol: String,
      tsCol: String, steps: Seq[String],
      withinMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(withinMicros.forall(_ > 0), "withinMicros must be positive")
    val w = Window.partitionBy(col(userCol))
    var d = df.withColumn("__s0",
      min(when(col(eventCol) === steps.head, col(tsCol))).over(w))
    steps.indices.drop(1).foreach { i =>
      val after = col(eventCol) === steps(i) &&
        col(tsCol) > col(s"__s${i - 1}")
      val bounded = withinMicros.fold(after)(us =>
        after && unix_micros(col(tsCol)) <= unix_micros(col("__s0")) + us)
      d = d.withColumn(s"__s$i", min(when(bounded, col(tsCol))).over(w))
    }
    val perUser = d.groupBy(col(userCol)).agg(
      max(col("__s0")).as("__s0"),
      steps.indices.drop(1).map(i => max(col(s"__s$i")).as(s"__s$i")): _*)
    val counts = perUser.agg(
      count(col("__s0")).as("__n0"),
      steps.indices.drop(1).map(i => count(col(s"__s$i")).as(s"__n$i")): _*)
    val stackArgs = steps.zipWithIndex.map { case (s, i) =>
      s"$i, '${s.replace("'", "''")}', __n$i"
    }.mkString(", ")
    counts.selectExpr(
      s"stack(${steps.size}, $stackArgs) AS (step_index, step, users)")
      .orderBy("step_index")
  }

  /** Retention cohorts: users grouped by their first-seen day (the
    * cohort), counted on each later day they came back — the classic
    * "day-N retention" triangle. Returns (cohort_date, day_offset,
    * users) for offsets 0..maxOffsetDays, ordered; offset 0 is the
    * cohort size.
    *
    * Plan shape: the first-seen day is a whole-partition `min` window
    * on the user key (one exchange); (cohort, offset) pairs then
    * aggregate with `count(DISTINCT user)` — Spark plans the distinct
    * as a two-phase partial/final expand, so no per-cohort row list
    * ever materializes. Two shuffles total (user, then cohort×offset),
    * the minimum for these semantics at any scale.
    */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String,
      maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, "maxOffsetDays must be non-negative")
    val w = Window.partitionBy(col(userCol))
    df.select(col(userCol), to_date(col(tsCol)).as("__day"))
      .withColumn("cohort_date", min(col("__day")).over(w))
      .withColumn("day_offset", datediff(col("__day"), col("cohort_date")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(count_distinct(col(userCol)).as("users"))
      .orderBy("cohort_date", "day_offset")
  }

  /** Linear interpolation of each key's series onto a dense daily grid:
    * grid days between two observations get the time-weighted blend of
    * the surrounding values; days outside the observed range stay at the
    * boundary value (LOCF forward / NOCB backward). Two window passes
    * (prev/next carried value+day), no self-join.
    */
  def resampleDailyLinear(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      orderCol: String, gridStart: String, gridEnd: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max_by(col(valCol), col(orderCol)).as("day_val"))
    val grid = df.select(col(keyCol)).distinct()
      .withColumn("day",
        explode(sequence(lit(gridStart).cast("date"), lit(gridEnd).cast("date"))))
    val sparse = grid.join(daily, Seq(keyCol, "day"), "left")
    val wAsc = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col(keyCol)).orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dayNum = datediff(col("day"), lit(gridStart).cast("date"))
    val withEnds = sparse
      .withColumn("pv", last(col("day_val"), ignoreNulls = true).over(wAsc))
      .withColumn("pd", last(when(col("day_val").isNotNull, dayNum), ignoreNulls = true).over(wAsc))
      .withColumn("nv", last(col("day_val"), ignoreNulls = true).over(wDesc))
      .withColumn("nd", last(when(col("day_val").isNotNull, dayNum), ignoreNulls = true).over(wDesc))
    withEnds.withColumn("interp_val",
        when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .when(col("nd") === col("pd"), col("pv"))
          .otherwise(col("pv") +
            (col("nv") - col("pv")) *
              (dayNum - col("pd")).cast("double") / (col("nd") - col("pd"))))
      .drop("day_val", "pv", "pd", "nv", "nd")
  }

  /** Exponentially-weighted moving average per key:
    * `y_i = alpha*x_i + (1-alpha)*y_{i-1}`, seeded with the first value.
    * Runs through the native [[graft.functions.Ewma]]
    * AggregateWindowFunction (the same expression the dialect's `ewma()`
    * uses): Spark's window executor evaluates the running frame
    * incrementally — one shuffle on the key, O(1) state per key, no row
    * buffering, and the recurrence stays inside the declarative plan
    * (AQE-visible) instead of an opaque mapPartitions.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      tieBreak: Seq[String], alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    // WindowExpression built directly with UnspecifiedFrame: the public
    // .over(WindowSpec) would impose the RANGE default frame, but an
    // AggregateWindowFunction pins its own running ROWS frame
    import org.apache.spark.sql.catalyst.expressions.{
      Ascending, SortOrder, UnspecifiedFrame, WindowExpression,
      WindowSpecDefinition}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.withColumn("ewma", ColumnBridge.column(WindowExpression(
      graft.functions.Ewma(
        ColumnBridge.expression(col(valCol).cast("double")), alpha),
      WindowSpecDefinition(
        Seq(ColumnBridge.expression(col(keyCol))),
        (col(tsCol) +: tieBreak.map(col)).map(c =>
          SortOrder(ColumnBridge.expression(c), Ascending)),
        UnspecifiedFrame))))
  }

  /** Two-phase bucket-then-stitch [[ewma]] — the hot-key mitigation for
    * the smoothing tier (the skew artifact measures the single-pass
    * recurrence at ~2.1× uniform when one series holds half the corpus:
    * a sequential scan serializes on its partition). EWMA is a LINEAR
    * recurrence, so it decomposes exactly:
    *
    *  - phase 1: the in-bucket scan, partitioned by (key, bucket) — the
    *    hot key fans out over its time buckets. Within a bucket the
    *    seed-at-first-value kernel computes z_i; the bucket composes
    *    affinely: y_end = A·y_in + B with A = (1−α)^n and
    *    B = z_n − A·x_1.
    *  - phase 2: [[graft.functions.AffineScan]] chains the per-bucket
    *    (A, B) pairs in one O(#buckets) pass per key — the only
    *    sequential step left, over bucket summaries, not rows.
    *  - phase 3: rows re-join their bucket's incoming state y_in and
    *    finish as y_i = z_i + (1−α)^i · (y_in − x_1).
    *
    * Mathematically identical to the single-pass form; numerically it
    * reassociates (powers via pow() instead of the multiply chain), so
    * expect agreement to ~1e-9 relative, not bit equality — the price
    * of parallelism, stated. Null-valued rows are dropped (a bucket
    * boundary cannot carry "no observation yet" state); filter or fill
    * upstream if the carried-forward null semantics of [[ewma]] are
    * needed. Output: input columns + `out` (dropping null-value rows).
    */
  def ewmaBucketed(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieBreak: Seq[String], alpha: Double,
      bucketSeconds: Long, out: String = "ewma"): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    ewmaStitched(df.filter(col(valCol).isNotNull), Seq(keyCol), tsCol,
      valCol, tieBreak, alpha, bucketSeconds * 1000000L, out)
  }

  /** The general bucket-then-stitch EWMA kernel — [[ewmaBucketed]] with
    * multi-column keys, a micros-granular bucket width, and the
    * single-pass form's FULL null semantics PRESERVED: a null-valued
    * row re-emits the last smoothed value (the [[graft.functions.Ewma]]
    * LOCF convention) and leaves the state unchanged, instead of being
    * dropped. This is the form the dialect's escaped
    * `ewma(x, α, '<width>')` compiles to, so the SQL front keeps its
    * null contract while gaining the hot-key topology.
    *
    * The decomposition tracks the RUNNING NON-NULL COUNT (not the row
    * number): each non-null observation multiplies the carried state by
    * (1−α), a null one doesn't — so y_i = z_i + (1−α)^cnn_i·(y_in −
    * x_1) with cnn_i = non-nulls up to row i, x_1 the bucket's first
    * non-null, z the in-bucket kernel value. An all-null bucket
    * composes as the identity (A = 1, B = 0) and its rows re-emit the
    * incoming state. Null KEY values stitch null-safely (they are their
    * own window partition in the single-pass form). Same ~1e-9
    * reassociation caveat as [[ewmaBucketed]].
    */
  def ewmaStitched(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieBreak: Seq[String], alpha: Double,
      bucketUs: Long, out: String = "ewma"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(bucketUs > 0, "bucketUs must be positive")
    import org.apache.spark.sql.catalyst.expressions.{
      Ascending, SortOrder, UnspecifiedFrame, WindowExpression,
      WindowSpecDefinition}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val om = 1.0 - alpha
    val u = unix_micros(col(tsCol))
    val rows = df.withColumn("__bk", u - pmod(u, lit(bucketUs)))
    val partNames = keys :+ "__bk"
    val ord = (col(tsCol) +: tieBreak.map(col)).map(c =>
      SortOrder(ColumnBridge.expression(c), Ascending))
    val zCol = ColumnBridge.column(WindowExpression(
      graft.functions.Ewma(
        ColumnBridge.expression(col(valCol).cast("double")), alpha),
      WindowSpecDefinition(
        partNames.map(c => ColumnBridge.expression(col(c))),
        ord, UnspecifiedFrame)))
    val w1 = Window.partitionBy(partNames.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    val runF = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = Window.partitionBy(partNames.map(col): _*)
    val withZ = rows.withColumn("__z", zCol)
      .withColumn("__rn", row_number().over(w1))
      .withColumn("__nb", count(lit(1)).over(wb))
      // running/in-bucket NON-NULL counts: the state multiplies by
      // (1−α) only on observations, so null rows don't advance the
      // exponent (count(col) skips nulls)
      .withColumn("__cnn", count(col(valCol)).over(runF))
      .withColumn("__x1", first(col(valCol).cast("double"),
        ignoreNulls = true).over(runF))
      // per-bucket non-null count, materialized BEFORE the summary
      // filter below (a window evaluated after it would see one row)
      .withColumn("__nnb", count(col(valCol)).over(wb))
    val aB = pow(lit(om), col("__nnb"))
    val summary = withZ.filter(col("__rn") === col("__nb"))
      .select((keys.map(col) :+ col("__bk") :+ aB.as("__A") :+
        // an all-null bucket is the identity map (A = 1, B = 0, null
        // seed): the incoming state passes through unchanged
        coalesce(col("__z") - aB * col("__x1"), lit(0.0)).as("__B") :+
        col("__z").as("__s")): _*)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__bk").asc)
    val yEnd = ColumnBridge.column(WindowExpression(
      graft.functions.AffineScan(
        ColumnBridge.expression(col("__A")),
        ColumnBridge.expression(col("__B")),
        ColumnBridge.expression(col("__s"))),
      WindowSpecDefinition(
        keys.map(c => ColumnBridge.expression(col(c))),
        Seq(SortOrder(ColumnBridge.expression(col("__bk")), Ascending)),
        UnspecifiedFrame)))
    val chained = summary.withColumn("__yend", yEnd)
      .withColumn("__y0", lag(col("__yend"), 1).over(w2))
      .select((keys.map(c => col(c).as(s"__st_$c")) :+
        col("__bk").as("__st_bk") :+ col("__y0")): _*)
    // null-safe on the keys: a null key is its own partition in the
    // single-pass window form and must stitch to its own summary
    val cond = keys.map(c => col(c) <=> col(s"__st_$c"))
      .foldLeft(col("__bk") === col("__st_bk"))(_ && _)
    withZ.join(chained, cond)
      .withColumn(out, when(col("__y0").isNull, col("__z"))
        .otherwise(when(col("__z").isNull, col("__y0"))
          .otherwise(col("__z") +
            pow(lit(om), col("__cnn")) * (col("__y0") - col("__x1")))))
      .drop((keys.map(c => s"__st_$c") ++ Seq("__st_bk", "__bk", "__z",
        "__rn", "__nb", "__nnb", "__cnn", "__x1", "__y0")): _*)
  }

  /** Two-phase bucket-then-stitch [[graft.functions.Holt]] — the
    * hot-key escape for double-exponential smoothing, generalizing
    * [[ewmaStitched]] to the 2-dimensional (level, trend) state. Holt's
    * recurrence is LINEAR: v_i = M·v_(i-1) + c·x_i with
    * M = [[1-α, 1-α], [-αβ, 1-αβ]], c = (α, αβ), so a bucket composes
    * affinely (v_end = M^n·v_in + d):
    *
    *  - phase 1 (parallel per (key, bucket)):
    *    [[graft.functions.HoltScan]] runs the seeded in-bucket
    *    recurrence AND the running matrix power P_i = M^(k-1) (the
    *    sensitivity of the state to the step-1 seed) in one window
    *    pass;
    *  - phase 2 (bucket-summary-sized): [[graft.functions.Affine2Scan]]
    *    chains the per-bucket (A = P_n·M, d = z_n + P_n·u) affine maps
    *    per key — O(#buckets), the only sequential step;
    *  - phase 3: rows re-join their bucket's incoming state v_in and
    *    finish as v_i = z_i + P_i·Δ₁, Δ₁ = M·v_in + c·x₁ − (x₁, 0).
    *
    * Mathematically identical to the single-pass kernel; numerically it
    * reassociates (matrix products instead of the scalar chain), so
    * expect ~1e-9 relative agreement — same caveat as [[ewmaStitched]],
    * and the same null contract: null values re-emit the carried state
    * (LOCF), null keys stitch null-safely, all-null buckets compose as
    * the identity. `forecast` emits l + b (one step ahead) like
    * [[graft.functions.Holt]].
    */
  def holtStitched(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieBreak: Seq[String], alpha: Double, beta: Double,
      bucketUs: Long, forecast: Boolean = false,
      out: String = "holt"): DataFrame =
    holtStitchedMulti(df, keys, tsCol, valCol, tieBreak, alpha, beta,
      bucketUs, Seq((out, forecast)))

  /** [[holtStitched]] with SEVERAL output faces off ONE pipeline: the
    * fit and forecast spellings share the entire phase-1/2 DAG (scan,
    * matrix powers, bucket chaining, join-back) and differ only in the
    * per-row finish expression, so a query selecting both (the
    * `boost_ts_holt_escape` shape) pays the kernel once instead of
    * per face. Each `(out, forecast)` pair adds one column; a single
    * pair is exactly the old behavior.
    */
  def holtStitchedMulti(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieBreak: Seq[String], alpha: Double, beta: Double,
      bucketUs: Long, outs: Seq[(String, Boolean)]): DataFrame = {
    require(outs.nonEmpty, "holtStitchedMulti needs at least one output")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(beta >= 0.0 && beta <= 1.0, "beta must be in [0, 1]")
    require(bucketUs > 0, "bucketUs must be positive")
    import org.apache.spark.sql.catalyst.expressions.{
      Ascending, SortOrder, UnspecifiedFrame, WindowExpression,
      WindowSpecDefinition}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val (m11, m12, m21, m22) =
      (1.0 - alpha, 1.0 - alpha, -(alpha * beta), 1.0 - alpha * beta)
    val u = unix_micros(col(tsCol))
    val rows = df.withColumn("__bk", u - pmod(u, lit(bucketUs)))
    val partNames = keys :+ "__bk"
    val ord = (col(tsCol) +: tieBreak.map(col)).map(c =>
      SortOrder(ColumnBridge.expression(c), Ascending))
    val hsCol = ColumnBridge.column(WindowExpression(
      graft.functions.HoltScan(
        ColumnBridge.expression(col(valCol).cast("double")), alpha, beta),
      WindowSpecDefinition(
        partNames.map(c => ColumnBridge.expression(col(c))),
        ord, UnspecifiedFrame)))
    val w1 = Window.partitionBy(partNames.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    val runF = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = Window.partitionBy(partNames.map(col): _*)
    val withS = rows.withColumn("__hs", hsCol)
      .withColumn("__rn", row_number().over(w1))
      .withColumn("__nb", count(lit(1)).over(wb))
      .withColumn("__x1", first(col(valCol).cast("double"),
        ignoreNulls = true).over(runF))
    def f(n: String) = col("__hs").getField(n)
    // per-bucket affine map: A = P_n·M, d = z_n + P_n·u with
    // u = ((α−1)·x₁, αβ·x₁); an all-null bucket (l null) is identity
    val u1 = lit(alpha - 1.0) * col("__x1")
    val u2 = lit(alpha * beta) * col("__x1")
    val isNullBk = f("l").isNull
    val summary = withS.filter(col("__rn") === col("__nb"))
      .select((keys.map(col) :+ col("__bk") :+
        when(isNullBk, lit(1.0)).otherwise(
          f("p11") * lit(m11) + f("p12") * lit(m21)).as("__a11") :+
        when(isNullBk, lit(0.0)).otherwise(
          f("p11") * lit(m12) + f("p12") * lit(m22)).as("__a12") :+
        when(isNullBk, lit(0.0)).otherwise(
          f("p21") * lit(m11) + f("p22") * lit(m21)).as("__a21") :+
        when(isNullBk, lit(1.0)).otherwise(
          f("p21") * lit(m12) + f("p22") * lit(m22)).as("__a22") :+
        when(isNullBk, lit(0.0)).otherwise(
          f("l") + (f("p11") * u1 + f("p12") * u2)).as("__d1") :+
        when(isNullBk, lit(0.0)).otherwise(
          f("b") + (f("p21") * u1 + f("p22") * u2)).as("__d2") :+
        f("l").as("__s1") :+ f("b").as("__s2")): _*)
    val yEnd = ColumnBridge.column(WindowExpression(
      graft.functions.Affine2Scan(
        ColumnBridge.expression(col("__a11")),
        ColumnBridge.expression(col("__a12")),
        ColumnBridge.expression(col("__a21")),
        ColumnBridge.expression(col("__a22")),
        ColumnBridge.expression(col("__d1")),
        ColumnBridge.expression(col("__d2")),
        ColumnBridge.expression(col("__s1")),
        ColumnBridge.expression(col("__s2"))),
      WindowSpecDefinition(
        keys.map(c => ColumnBridge.expression(col(c))),
        Seq(SortOrder(ColumnBridge.expression(col("__bk")), Ascending)),
        UnspecifiedFrame)))
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__bk").asc)
    val chained = summary.withColumn("__yend", yEnd)
      .withColumn("__y0", lag(col("__yend"), 1).over(w2))
      .select((keys.map(c => col(c).as(s"__st_$c")) :+
        col("__bk").as("__st_bk") :+
        col("__y0").getField("y1").as("__y0l") :+
        col("__y0").getField("y2").as("__y0b")): _*)
    val cond = keys.map(c => col(c) <=> col(s"__st_$c"))
      .foldLeft(col("__bk") === col("__st_bk"))(_ && _)
    val y0l = col("__y0l"); val y0b = col("__y0b")
    // per-row finish: Δ₁ then the P_i-propagated correction
    val del1 = lit(1.0 - alpha) * (y0l + y0b) + lit(alpha - 1.0) * col("__x1")
    val del2 = lit(m21) * y0l + lit(m22) * y0b +
      lit(alpha * beta) * col("__x1")
    val li = f("l") + (f("p11") * del1 + f("p12") * del2)
    val bi = f("b") + (f("p21") * del1 + f("p22") * del2)
    def outCol(forecast: Boolean): Column =
      when(y0l.isNull, if (forecast) f("l") + f("b") else f("l"))
        .otherwise(when(f("l").isNull,
          if (forecast) y0l + y0b else y0l)
          .otherwise(if (forecast) li + bi else li))
    outs.foldLeft(withS.join(chained, cond)) {
        case (d, (out, forecast)) => d.withColumn(out, outCol(forecast))
      }
      .drop((keys.map(c => s"__st_$c") ++ Seq("__st_bk", "__bk", "__hs",
        "__rn", "__nb", "__x1", "__y0l", "__y0b")): _*)
  }

  /** Two-phase bucket-then-stitch [[graft.functions.HoltWinters]] —
    * the hot-key escape for additive triple-exponential smoothing,
    * generalizing [[holtStitched]] to the (2+p)-dimensional
    * (level, trend, seasonal-cycle) state. The recurrence is LINEAR in
    * that state, but the step matrix depends on WHICH seasonal slot the
    * step reads — slot = (global observation count) mod p — so each
    * bucket's kernel must know its ENTRY PHASE φ (observations in all
    * prior buckets of the key, mod p). That adds a phase 0 the 1- and
    * 2-state stitches don't need:
    *
    *  - phase 0 (bucket-summary-sized): per-(key, bucket) non-null
    *    counts via groupBy, a running prefix sum per key over the
    *    BUCKET SUMMARIES (exact integer arithmetic — never a row-level
    *    window on the bare key), φ = prefix mod p, joined back to rows;
    *  - phase 1 (parallel per (key, bucket)):
    *    [[graft.functions.HwScan]] runs the seeded in-bucket recurrence
    *    AND left-accumulates the running matrix product
    *    P_i = M_(j_i)···M_(j_2) in one window pass;
    *  - phase 2 (bucket-summary-sized): per-bucket affine maps
    *    (A = P_n·M_φ, d = z_n + P_n·u, seed = z_n) chained per key by
    *    [[graft.functions.AffineArrScan]] — O(#buckets), the only
    *    sequential step;
    *  - phase 3: rows re-join their bucket's incoming state v_in and
    *    finish as v_i = z_i + P_i·Δ₁ with
    *    Δ₁ = M_φ·v_in + c_φ·x₁ − (x₁, 0, …) — only the emitted
    *    components (level + the row's seasonal slot, plus trend for the
    *    forecast face) are materialized.
    *
    * Mathematically identical to the single-pass kernel; numerically it
    * reassociates (matrix products instead of the scalar chain), so
    * expect ~1e-9 relative agreement — same caveat and null contract as
    * [[holtStitched]] (null values re-emit the carried fit, null keys
    * stitch null-safely, all-null buckets compose as the identity).
    * `forecast` emits the one-step-ahead l + b + s_(next slot). The
    * period is capped at 8 (see [[graft.functions.HwScan]]).
    */
  def holtWintersStitched(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieBreak: Seq[String], alpha: Double, beta: Double,
      gamma: Double, period: Int, bucketUs: Long,
      forecast: Boolean = false, out: String = "holt_winters"): DataFrame =
    holtWintersStitchedMulti(df, keys, tsCol, valCol, tieBreak, alpha,
      beta, gamma, period, bucketUs, Seq((out, forecast)))

  /** [[holtWintersStitched]] with SEVERAL output faces off ONE
    * pipeline — the [[holtStitchedMulti]] discipline for the seasonal
    * kernel: phases 0–2 (entry-phase counts, HwScan matrix powers,
    * AffineArrScan chaining, join-back) are face-independent; only the
    * per-row finish differs between fit and forecast.
    */
  def holtWintersStitchedMulti(df: DataFrame, keys: Seq[String],
      tsCol: String, valCol: String, tieBreak: Seq[String], alpha: Double,
      beta: Double, gamma: Double, period: Int, bucketUs: Long,
      outs: Seq[(String, Boolean)]): DataFrame = {
    require(outs.nonEmpty, "holtWintersStitchedMulti needs at least one output")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(beta >= 0.0 && beta <= 1.0, "beta must be in [0, 1]")
    require(gamma >= 0.0 && gamma <= 1.0, "gamma must be in [0, 1]")
    require(period >= 2 && period <= 8, "period must be in [2, 8]")
    require(bucketUs > 0, "bucketUs must be positive")
    import org.apache.spark.sql.catalyst.expressions.{
      Ascending, SortOrder, UnspecifiedFrame, WindowExpression,
      WindowSpecDefinition}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = 2 + period
    // step-matrix coefficients (the HwScan scaladoc's rows)
    val a1 = 1.0 - alpha; val a2 = -alpha
    val b1 = -(alpha * beta); val b2 = 1.0 - alpha * beta
    val b3 = -(alpha * beta)
    val g1 = -(gamma * (1.0 - alpha)); val g2 = gamma * alpha + 1.0 - gamma
    val uTs = unix_micros(col(tsCol))
    val rows = df.withColumn("__bk", uTs - pmod(uTs, lit(bucketUs)))
    // --- phase 0: entry phase per bucket --------------------------------
    val counts = rows.groupBy((keys :+ "__bk").map(col): _*)
      .agg(count(col(valCol)).as("__c"))
    val wph = Window.partitionBy(keys.map(col): _*).orderBy(col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val phases = counts
      .withColumn("__ph",
        pmod(coalesce(sum(col("__c")).over(wph), lit(0L)),
          lit(period.toLong)))
      .select(keys.map(c => col(c).as(s"__phk_$c")) ++
        Seq(col("__bk").as("__phk_bk"), col("__ph")): _*)
    val condPh = keys.map(c => col(c) <=> col(s"__phk_$c"))
      .foldLeft(col("__bk") === col("__phk_bk"))(_ && _)
    val rows2 = rows.join(phases, condPh)
      .drop(keys.map(c => s"__phk_$c") :+ "__phk_bk": _*)
    // --- phase 1: seeded in-bucket scan + running matrix product --------
    val partNames = keys :+ "__bk"
    val ord = (col(tsCol) +: tieBreak.map(col)).map(c =>
      SortOrder(ColumnBridge.expression(c), Ascending))
    val hsCol = ColumnBridge.column(WindowExpression(
      graft.functions.HwScan(
        ColumnBridge.expression(col(valCol).cast("double")),
        ColumnBridge.expression(col("__ph")), alpha, beta, gamma, period),
      WindowSpecDefinition(
        partNames.map(c => ColumnBridge.expression(col(c))),
        ord, UnspecifiedFrame)))
    val w1 = Window.partitionBy(partNames.map(col): _*)
      .orderBy((col(tsCol) +: tieBreak.map(col)).map(_.asc): _*)
    val wb = Window.partitionBy(partNames.map(col): _*)
    val withS = rows2.withColumn("__hs", hsCol)
      .withColumn("__rn", row_number().over(w1))
      .withColumn("__nb", count(lit(1)).over(wb))
      .withColumn("__x1", first(col(valCol).cast("double"),
        ignoreNulls = true).over(wb))
    def f(nm: String) = col("__hs").getField(nm)
    def sOf(m: Int) = f("s").getItem(m)
    def pOf(r: Int, c: Int) = f("p").getItem(r * dim + c)
    // P column c of the φ-slot row, dispatched on the bucket's phase
    def pPhi(r: Int): Column = (0 until period).map(m =>
      when(col("__ph") === m, pOf(r, 2 + m))).reduceRight(_ otherwise _)
    def stateOf(r: Int): Column =
      if (r == 0) f("l") else if (r == 1) f("b") else sOf(r - 2)
    // --- phase 2: per-bucket affine maps, chained per key ---------------
    val isNullBk = f("l").isNull
    val u1 = lit(alpha - 1.0) * col("__x1")
    val u2 = lit(alpha * beta) * col("__x1")
    val u3 = lit(gamma * (1.0 - alpha)) * col("__x1")
    val aEntries: Seq[Column] = (0 until dim).flatMap { r =>
      (0 until dim).map { c =>
        val stepped: Column = c match {
          // A = P_n·M_φ — columns l and b mix rows l/b/s_φ of M; a
          // seasonal column c is only touched when c is the φ slot
          case 0 => pOf(r, 0) * lit(a1) + pOf(r, 1) * lit(b1) +
            pPhi(r) * lit(g1)
          case 1 => pOf(r, 0) * lit(a1) + pOf(r, 1) * lit(b2) +
            pPhi(r) * lit(g1)
          case _ =>
            val m = c - 2
            when(col("__ph") === m,
              pOf(r, 0) * lit(a2) + pOf(r, 1) * lit(b3) +
                pOf(r, c) * lit(g2))
              .otherwise(pOf(r, c))
        }
        when(isNullBk, lit(if (r == c) 1.0 else 0.0)).otherwise(stepped)
      }
    }
    val dEntries: Seq[Column] = (0 until dim).map { r =>
      when(isNullBk, lit(0.0)).otherwise(
        stateOf(r) + (pOf(r, 0) * u1 + pOf(r, 1) * u2 + pPhi(r) * u3))
    }
    val sEntries: Seq[Column] = (0 until dim).map { r =>
      when(isNullBk, lit(null).cast("double")).otherwise(stateOf(r))
    }
    val summary = withS.filter(col("__rn") === col("__nb"))
      .select(keys.map(col) ++ Seq(col("__bk"), col("__ph"), col("__x1"),
        array(aEntries: _*).as("__A"), array(dEntries: _*).as("__d"),
        array(sEntries: _*).as("__s")): _*)
    val yEnd = ColumnBridge.column(WindowExpression(
      graft.functions.AffineArrScan(
        ColumnBridge.expression(col("__A")),
        ColumnBridge.expression(col("__d")),
        ColumnBridge.expression(col("__s")), dim),
      WindowSpecDefinition(
        keys.map(c => ColumnBridge.expression(col(c))),
        Seq(SortOrder(ColumnBridge.expression(col("__bk")), Ascending)),
        UnspecifiedFrame)))
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(col("__bk").asc)
    // Δ₁ per bucket: M_φ·v_in + c_φ·x₁ − (x₁, 0, …) — the seed-state
    // discrepancy the per-row P_i correction propagates
    val vl = col("__vin").getItem(0)
    val vb = col("__vin").getItem(1)
    def vs(m: Int) = col("__vin").getItem(2 + m)
    val vsPhi: Column = (0 until period).map(m =>
      when(col("__ph") === m, vs(m))).reduceRight(_ otherwise _)
    val dl = lit(1.0 - alpha) * (vl + vb) + lit(-alpha) * vsPhi + u1
    val db = lit(b1) * vl + lit(b2) * vb + lit(b3) * vsPhi + u2
    val dsEntries: Seq[Column] = (0 until period).map { m =>
      when(col("__ph") === m,
        lit(g1) * vl + lit(g1) * vb + lit(g2) * vs(m) + u3)
        .otherwise(vs(m))
    }
    val chained = summary.withColumn("__yend", yEnd)
      .withColumn("__vin", lag(col("__yend"), 1).over(w2))
      .withColumn("__delta", array(dl +: db +: dsEntries: _*))
      .select(keys.map(c => col(c).as(s"__st_$c")) ++
        Seq(col("__bk").as("__st_bk"), col("__vin"), col("__delta")): _*)
    val cond = keys.map(c => col(c) <=> col(s"__st_$c"))
      .foldLeft(col("__bk") === col("__st_bk"))(_ && _)
    // --- phase 3: per-row finish ----------------------------------------
    def corr(r: Int): Column = (0 until dim).map(c =>
      pOf(r, c) * col("__delta").getItem(c)).reduceLeft(_ + _)
    val corrL = corr(0); val corrB = corr(1)
    def slotCase(idx: Column, body: Int => Column): Column =
      (0 until period).map(m =>
        when(pmod(idx, lit(period.toLong)) === m, body(m)))
        .reduceRight(_ otherwise _)
    val jjFit = col("__ph") + f("n") - lit(1L)
    val jjFc = col("__ph") + f("n")
    val vinNull = vl.isNull
    def outCol(forecast: Boolean): Column =
      if (!forecast)
        when(vinNull, f("l") + slotCase(jjFit, sOf))
          .otherwise(when(f("l").isNull,
            vl + slotCase(col("__ph") + lit(period.toLong) - lit(1L), vs))
            .otherwise((f("l") + corrL) +
              slotCase(jjFit, m => sOf(m) + corr(2 + m))))
      else
        when(vinNull, (f("l") + f("b")) + slotCase(jjFc, sOf))
          .otherwise(when(f("l").isNull,
            (vl + vb) + slotCase(col("__ph"), vs))
            .otherwise(((f("l") + corrL) + (f("b") + corrB)) +
              slotCase(jjFc, m => sOf(m) + corr(2 + m))))
    outs.foldLeft(withS.join(chained, cond)) {
        case (d, (out, forecast)) => d.withColumn(out, outCol(forecast))
      }
      .drop(keys.map(c => s"__st_$c") ++ Seq("__st_bk", "__bk", "__ph",
        "__hs", "__rn", "__nb", "__x1", "__vin", "__delta"): _*)
  }

  /** Time-weighted average per key (the TimescaleDB
    * `time_weighted_average` / trapezoid-integral aggregate): for
    * irregularly-sampled series, the plain AVG over-weights densely
    * sampled stretches; the time-weighted mean integrates the
    * piecewise-linear value curve and divides by the observed span —
    *
    *   twa = Σᵢ (vᵢ + vᵢ₊₁)/2 · (tᵢ₊₁ − tᵢ)  /  (t_max − t_min)
    *
    * Shape: one lead() window pass on the key exchange (segment values),
    * then a hash aggregate on the SAME key — the exchange is reused, no
    * second shuffle. Computed as an exact integer numerator when
    * `valCol` is integral (segments are value·micros longs, summed
    * exactly whatever the partitioning) with ONE double division at the
    * end — the determinism contract that gives it a cross-engine
    * oracle; a double `valCol` works but inherits double-sum rounding.
    * Single-point keys have zero span → null (no time to weight).
    * Output: key columns + `twa` (in `valCol` units).
    */
  def timeWeightedAvg(df: DataFrame, by: Seq[String], tsCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(by.map(col): _*).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val v = col(valCol)
    val seg = (v + lead(v, 1).over(w)) * (lead(us, 1).over(w) - us)
    df.select(by.map(col) :+ seg.as("__seg2") :+ us.as("__us"): _*)
      .groupBy(by.map(col): _*)
      .agg(sum(col("__seg2")).as("__num2"),
        (max(col("__us")) - min(col("__us"))).as("__span"))
      .select(by.map(col) :+
        (col("__num2").cast("double") / 2.0 /
          col("__span").cast("double")).as("twa"): _*)
  }

  /** Two-phase bucket-then-stitch [[timeWeightedAvg]] — the hot-key
    * mitigation the scale artifacts document, implemented: the
    * single-pass form's lead() window partitions by the key alone, so a
    * key holding a large share of the corpus serializes its whole
    * series through one task (the BENCH_scale_rel100 ts_twa shape — 5
    * distinct keys cap the window parallelism at 5 however many cores
    * exist). The trapezoid integral decomposes EXACTLY over any time
    * partition, so phase 1 computes per-(key, bucket) partial segment
    * sums with windows partitioned by (key, bucket) — parallelism =
    * keys × buckets — plus each bucket's first/last (ts, value)
    * endpoint; phase 2 runs over the BUCKET-COUNT-sized frame only,
    * stitching the boundary segment between consecutive buckets (last
    * point of bucket i → first point of bucket i+1) and dividing by the
    * key's span. Over integral inputs (the repo's cents convention)
    * every partial sum is exact, so the result EQUALS the single-pass
    * form bit for bit; over doubles it agrees to summation-order
    * rounding (the segments are identical, only their addition order
    * differs).
    *
    * `bucketSeconds` is the parallelism knob: pick it so each (key,
    * bucket) slice fits a task comfortably (points-per-key-per-bucket ≈
    * rows / keys / buckets).
    */
  def timeWeightedAvgBucketed(df: DataFrame, by: Seq[String], tsCol: String,
      valCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val us = unix_micros(col(tsCol))
    val v = col(valCol)
    val bucketed = df.select(by.map(col) :+ v.as("__v") :+ us.as("__us") :+
      (us - pmod(us, lit(bucketSeconds * 1000000L))).as("__bk"): _*)
    // phase 1: within-bucket segments — windows keyed on (key, bucket),
    // so a hot key fans out over its buckets instead of one task
    val wIn = Window.partitionBy((by :+ "__bk").map(col): _*)
      .orderBy(col("__us"))
    val seg = (col("__v") + lead(col("__v"), 1).over(wIn)) *
      (lead(col("__us"), 1).over(wIn) - col("__us"))
    val perBucket = bucketed
      .withColumn("__seg", seg)
      .groupBy((by :+ "__bk").map(col): _*)
      .agg(sum(col("__seg")).as("__num"),
        min(struct(col("__us"), col("__v"))).as("__first"),
        max(struct(col("__us"), col("__v"))).as("__last"))
    // phase 2: boundary segments between consecutive buckets + span —
    // runs over |key, bucket| rows (orders of magnitude below the scan)
    val wB = Window.partitionBy(by.map(col): _*).orderBy(col("__bk"))
    val nf = lead(col("__first"), 1).over(wB)
    val boundary = (col("__last.__v") + nf.getField("__v")) *
      (nf.getField("__us") - col("__last.__us"))
    perBucket
      .withColumn("__bseg", boundary)
      .groupBy(by.map(col): _*)
      .agg(sum(col("__num")).as("__n1"), sum(col("__bseg")).as("__n2"),
        min(col("__first.__us")).as("__lo"), max(col("__last.__us")).as("__hi"))
      // a key with no segment at all (single point / all-null values)
      // is null in the single-pass form — keep parity (0/0 would NaN)
      .select(by.map(col) :+
        when(col("__n1").isNotNull || col("__n2").isNotNull,
          (coalesce(col("__n1"), lit(0L)) + coalesce(col("__n2"), lit(0L)))
            .cast("double") / 2.0 /
            (col("__hi") - col("__lo")).cast("double")).as("twa"): _*)
  }

  /** Resample each key onto a dense daily grid over [gridStart, gridEnd]
    * and carry the last observed value forward (LOCF gap-fill). The grid
    * is built with `sequence` + `explode` per key — no driver-side loops —
    * and the fill is one window pass.
    *
    * `pickLast` chooses the representative value within a day: max_by of
    * `valCol` by `orderCol` (the latest observation of the day).
    */
  def resampleDailyLocf(
      df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      orderCol: String, gridStart: String, gridEnd: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max_by(col(valCol), col(orderCol)).as("day_val"))
    val grid = df.select(col(keyCol)).distinct()
      .withColumn("day",
        explode(sequence(lit(gridStart).cast("date"), lit(gridEnd).cast("date"))))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("locf_val", last(col("day_val"), ignoreNulls = true).over(w))
      .drop("day_val")
  }
}
