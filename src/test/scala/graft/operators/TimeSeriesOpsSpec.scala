package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Direct unit coverage for TimeSeriesOps corners the oracle queries
  * don't reach: as-of tolerance, EWMA recurrence on a known series,
  * sessionization gap edges.
  */
class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin tolerance nulls out stale matches") {
    val left = Seq(
      ("k", ts("2024-01-01 00:00:10"), 1),
      ("k", ts("2024-01-01 00:10:00"), 2)
    ).toDF("k", "ts", "lv")
    val right = Seq(
      ("k", ts("2024-01-01 00:00:05"), 100.0)
    ).toDF("k", "ts", "rv")
    val noTol = TimeSeriesOps.asofJoin(left, right, Seq("k"), "ts", Seq("rv"))
      .orderBy("lv").select("asof_rv").collect().map(r => Option(r.get(0)))
    assert(noTol.toSeq == Seq(Some(100.0), Some(100.0)))
    // 60s tolerance: the 00:10 left row is ~10 min after the match → null
    val tol = TimeSeriesOps.asofJoin(left, right, Seq("k"), "ts", Seq("rv"),
      toleranceMicros = Some(60L * 1000000))
      .orderBy("lv").select("asof_rv").collect().map(r => Option(r.get(0)))
    assert(tol.toSeq == Seq(Some(100.0), None))
  }

  test("asofJoin nearest picks the closer direction, ties prefer backward") {
    val left = Seq(
      ("k", ts("2024-01-01 00:01:00"), 1), // bwd 60s away, fwd 30s → fwd
      ("k", ts("2024-01-01 00:02:00"), 2), // bwd 30s away, fwd 90s → bwd
      ("k", ts("2024-01-01 00:05:30"), 3), // bwd 120s = fwd 120s → tie: bwd
      ("k", ts("2024-01-01 01:00:00"), 4)  // both beyond 10 min tol → null
    ).toDF("k", "ts", "lv")
    val right = Seq(
      ("k", ts("2024-01-01 00:00:00"), 10.0),
      ("k", ts("2024-01-01 00:01:30"), 20.0),
      ("k", ts("2024-01-01 00:03:30"), 30.0),
      ("k", ts("2024-01-01 00:07:30"), 40.0)
    ).toDF("k", "ts", "rv")
    val got = TimeSeriesOps.asofJoin(left, right, Seq("k"), "ts", Seq("rv"),
      toleranceMicros = Some(10L * 60 * 1000000), direction = "nearest")
      .orderBy("lv").select("asof_rv").collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(20.0), Some(20.0), Some(30.0), None))
    // no tolerance: the 01:00 row has no forward candidate at all, so
    // nearest degrades to the backward match (00:07:30 → 40.0)
    val noTol = TimeSeriesOps.asofJoin(left, right, Seq("k"), "ts", Seq("rv"),
      direction = "nearest")
      .orderBy("lv").select("asof_rv").collect().map(r => Option(r.get(0)))
    assert(noTol.toSeq == Seq(Some(20.0), Some(20.0), Some(30.0), Some(40.0)))
  }

  test("ewma recurrence matches a hand-rolled fold") {
    val xs = Seq(10.0, 20.0, 30.0, 40.0)
    val df = xs.zipWithIndex.map { case (v, i) =>
      ("k", ts(f"2024-01-01 00:00:0$i"), v) }.toDF("k", "ts", "v")
    val got = TimeSeriesOps.ewma(df, "k", "ts", "v", Seq.empty, alpha = 0.5)
      .orderBy("ts").select("ewma").collect().map(_.getDouble(0)).toSeq
    val expected = xs.tail.scanLeft(xs.head)((y, x) => 0.5 * x + 0.5 * y)
    assert(got.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("bucketed twa equals single-pass exactly; windows key on (key, bucket)") {
    import graft.tables.Tables
    val e = Tables.events(spark, sfDir)
      .withColumn("cents", col("value").multiply(100.0).cast("long"))
    val single = TimeSeriesOps.timeWeightedAvg(e,
        Seq("event_type", "user_id"), "ts", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val bucketed = TimeSeriesOps.timeWeightedAvgBucketed(e,
        Seq("event_type", "user_id"), "ts", "cents", bucketSeconds = 86400L)
    val two = bucketed.collect().map(r => (r.getString(0), r.getLong(1)) ->
      Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // integral inputs: EXACT equality, not tolerance — the decomposed
    // sums are the same longs
    assert(two == single && single.nonEmpty)
    // the mitigation's point: phase-1 windows partition by
    // (key..., bucket), so a hot key fans out over its buckets
    val plan = bucketed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("windowspecdefinition(event_type") &&
      plan.contains("__bk"),
      s"phase-1 window must key on (key, bucket):\n$plan")
  }

  test("madOutliers flags by |v - median| > k*MAD and plans one exchange") {
    // values 1..7 plus 100: median 4.5, devs (3.5,2.5,1.5,.5,.5,1.5,2.5,95.5),
    // MAD = 2.0 → only 100 exceeds 3*MAD = 6
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0)
    val df = xs.zipWithIndex.map { case (v, i) =>
      ("k", ts(f"2024-01-01 00:00:0$i"), v) }.toDF("k", "ts", "v")
    val out = TimeSeriesOps.madOutliers(df, Seq("k"), "v", k = 3.0)
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getAs[Double]("v") == 100.0)
    assert(rows(0).getAs[Double]("mad") == 2.0 &&
      rows(0).getAs[Double]("dev") == 95.5)
    // both median windows partition on the same key: exactly one
    // exchange, never a medians-table self-join
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), s"mad must not self-join:\n$plan")
    // an all-constant key has MAD 0 and flags nothing
    val const = Seq.fill(5)(7.0).zipWithIndex.map { case (v, i) =>
      ("k", ts(f"2024-01-01 00:00:0$i"), v) }.toDF("k", "ts", "v")
    assert(TimeSeriesOps.madOutliers(const, Seq("k"), "v").count() == 0)
  }

  test("madOutliersAgg is bit-identical to the window form; broadcasts, " +
      "never shuffles rows on the key") {
    import graft.tables.Tables
    val e = Tables.events(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type"), r.getAs[Long]("event_id"))
    def vals(r: org.apache.spark.sql.Row) =
      (r.getAs[Double]("dev"), r.getAs[Double]("mad"))
    val win = TimeSeriesOps.madOutliers(e, Seq("event_type"), "value")
      .collect().map(r => key(r) -> vals(r)).toMap
    val agg = TimeSeriesOps.madOutliersAgg(e, Seq("event_type"), "value")
    val got = agg.collect().map(r => key(r) -> vals(r)).toMap
    assert(got == win && win.nonEmpty)
    // the escape's point: medians pin back via BROADCAST joins (data
    // rows never shuffle or sort on the key — no Window, no
    // SortMergeJoin) and the percentile aggregates partial-merge
    // map-side, so the only key exchanges carry count-map summaries
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_percentile"),
      s"median must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      s"rows must never shuffle/sort on the key:\n$plan")
    // null by-keys group together, matching the window partitioning
    val withNull = Seq((null.asInstanceOf[String], 1.0),
      (null.asInstanceOf[String], 2.0), (null.asInstanceOf[String], 3.0),
      (null.asInstanceOf[String], 4.0), (null.asInstanceOf[String], 5.0),
      (null.asInstanceOf[String], 6.0), (null.asInstanceOf[String], 7.0),
      (null.asInstanceOf[String], 100.0)).toDF("k", "v")
    val nOut = TimeSeriesOps.madOutliersAgg(withNull, Seq("k"), "v")
    assert(nOut.count() ==
      TimeSeriesOps.madOutliers(withNull, Seq("k"), "v").count())
  }

  test("rollingZScoreBucketed is bit-identical to the single pass; " +
      "windows key on (key, row-bucket)") {
    import graft.tables.Tables
    val e = Tables.events(spark, sfDir)
    def zmap(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "zscore").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val single = zmap(TimeSeriesOps.rollingZScore(e, Seq("event_type"),
      "ts", "value", Seq("event_id"), window = 20))
    // tiny rowsPerBucket (>= window) forces MANY carry boundaries — the
    // hardest case for the stitch; bit equality, not tolerance
    val bucketed = TimeSeriesOps.rollingZScoreBucketed(e, Seq("event_type"),
      "ts", "value", Seq("event_id"), window = 20,
      bucketSeconds = 3600L, rowsPerBucket = 32)
    assert(zmap(bucketed) == single && single.nonEmpty)
    // phase-3 windows partition by (key, row-bucket): the hot key fans
    // out instead of serializing in one task
    val plan = bucketed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("windowspecdefinition(event_type") &&
      plan.contains("__rbk"),
      s"phase-3 window must key on (key, row-bucket):\n$plan")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.rollingZScoreBucketed(e, Seq("event_type"), "ts",
        "value", Seq("event_id"), window = 20, rowsPerBucket = 10)
    }
  }

  test("rollingZScore matches a hand-rolled trailing-window computation") {
    val xs = Seq(10.0, 12.0, 8.0, 30.0, 11.0, 9.0)
    val df = xs.zipWithIndex.map { case (v, i) =>
      ("k", ts(f"2024-01-01 00:00:0$i"), i.toLong, v) }.toDF("k", "ts", "id", "v")
    val got = TimeSeriesOps.rollingZScore(df, Seq("k"), "ts", "v", Seq("id"),
      window = 3, out = "z")
      .orderBy("ts").select("z").collect().map(r => Option(r.get(0))).toSeq
    def expect(i: Int): Option[Double] = {
      val w = xs.slice(math.max(0, i - 2), i + 1)
      val mu = w.sum / w.size
      val sd = if (w.size < 2) 0.0
        else math.sqrt(w.map(x => (x - mu) * (x - mu)).sum / (w.size - 1))
      if (sd > 0) Some(math.rint((xs(i) - mu) / sd * 1e6) / 1e6) else None
    }
    got.zipWithIndex.foreach { case (g, i) =>
      (g, expect(i)) match {
        case (Some(a: Double), Some(b)) => assert(math.abs(a - b) < 1e-6, s"row $i")
        case (None, None)               => ()
        case other                      => fail(s"row $i: $other")
      }
    }
    // first row of every key has a single-point window → null, never NaN
    assert(got.head.isEmpty)
  }

  test("sessionize splits exactly at gaps beyond the threshold") {
    val df = Seq(
      ("u", ts("2024-01-01 00:00:00"), 1L),
      ("u", ts("2024-01-01 00:30:00"), 2L), // 30 min gap — same session
      ("u", ts("2024-01-01 02:00:01"), 3L), // >90 min gap — new session
      ("u", ts("2024-01-01 02:10:00"), 4L)
    ).toDF("u", "ts", "id")
    val got = TimeSeriesOps.sessionize(df, Seq("u"), "ts", Seq("id"),
      gapSeconds = 5400)
      .orderBy("id").select("session_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L, 1L))
  }

  test("m4Downsample keeps exactly first/last/min/max per bucket, merged") {
    // one 1-hour bucket with distinct extremes -> 4 points; a second
    // bucket where a single point is first+last+min+max -> 1 point
    val rows = Seq(
      ("cpu", ts("2024-01-01 00:05:00"), 5.0, 1L),  // first
      ("cpu", ts("2024-01-01 00:20:00"), 1.0, 2L),  // min
      ("cpu", ts("2024-01-01 00:30:00"), 9.0, 3L),  // max
      ("cpu", ts("2024-01-01 00:40:00"), 4.0, 4L),  // interior — dropped
      ("cpu", ts("2024-01-01 00:50:00"), 6.0, 5L),  // last
      ("cpu", ts("2024-01-01 01:30:00"), 7.0, 6L)   // lone point, next bucket
    ).toDF("k", "ts", "v", "id")
    val got = TimeSeriesOps
      .m4Downsample(rows, Seq("k"), "ts", "v", Seq("id"), bucketSeconds = 3600L)
      .orderBy("bucket", "ts")
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Double]("v")))
    assert(got.length == 5)
    assert(got.map(_._2).toSeq == Seq(5.0, 1.0, 9.0, 6.0, 7.0))
    assert(got.map(_._1).distinct.length == 2)
    // value ties break deterministically on (ts, tie): rerun equal
    val tied = Seq(
      ("cpu", ts("2024-01-01 00:01:00"), 3.0, 1L),
      ("cpu", ts("2024-01-01 00:02:00"), 3.0, 2L),
      ("cpu", ts("2024-01-01 00:03:00"), 3.0, 3L)
    ).toDF("k", "ts", "v", "id")
    def run() = TimeSeriesOps
      .m4Downsample(tied, Seq("k"), "ts", "v", Seq("id"), 3600L)
      .orderBy("ts").collect().map(_.getAs[java.sql.Timestamp]("ts")).toSeq
    val first = run()
    // first(=min) and last(=max) survive; the middle point is interior
    assert(first == Seq(ts("2024-01-01 00:01:00"), ts("2024-01-01 00:03:00")))
    assert(run() == first)
  }

  test("lttbDownsample: endpoint anchors, triangle-max pick, null drop") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows: Seq[(String, java.sql.Timestamp, java.lang.Double)] = Seq(
      ("k", t(1), 1.0),    // bucket 0 (first) → endpoint pick
      ("k", t(11), 0.0),   // bucket 1 …
      ("k", t(13), null),  // null value: excluded entirely
      ("k", t(15), 10.0),  // … the spike: largest triangle vs neighbors
      ("k", t(19), 0.0),
      ("k", t(25), 0.0))   // bucket 2 (last) → endpoint pick
    val df = spark.createDataFrame(rows).toDF("k", "ts", "v")
    def run(d: org.apache.spark.sql.DataFrame) = TimeSeriesOps
      .lttbDownsample(d, Seq("k"), "ts", "v", bucketSeconds = 10L)
      .orderBy("bucket")
      .collect().map(r => (r.getAs[Long]("bucket"),
        r.getAs[java.sql.Timestamp]("ts").getTime / 1000L,
        r.getAs[Double]("v"))).toSeq
    val got = run(df)
    assert(got == Seq((0L, 1L, 1.0), (1L, 15L, 10.0), (2L, 25L, 0.0)))
    // narrow determinism: any partitioning, same picks (exact-sum
    // averages — double summation order never leaks into the result)
    assert(run(df.repartition(7)) == got)
    // ≤ 1 point per middle bucket however many points it holds
    assert(got.map(_._1).distinct.length == got.length)
    intercept[IllegalArgumentException](
      TimeSeriesOps.lttbDownsample(df, Seq("k"), "ts", "v", 0L))
    // single-bucket key: both endpoint anchors live in one bucket, so
    // it emits the first AND last point (the documented exception to
    // ≤1/bucket) — and just one when they coincide
    val one = Seq(("k", t(1), 1.0), ("k", t(3), 7.0), ("k", t(5), 2.0))
    val oneGot = run(spark.createDataFrame(one).toDF("k", "ts", "v"))
    assert(oneGot == Seq((0L, 1L, 1.0), (0L, 5L, 2.0)))
    val solo = Seq(("k", t(1), 1.0))
    assert(run(spark.createDataFrame(solo).toDF("k", "ts", "v")) ==
      Seq((0L, 1L, 1.0)))
  }

  test("timeWeightedAvg: trapezoid integral, gap weighting, null span") {
    // constant series -> the constant, however irregular the sampling
    val const = Seq(
      ("cpu", ts("2024-01-01 00:00:00"), 5L),
      ("cpu", ts("2024-01-01 00:00:07"), 5L),
      ("cpu", ts("2024-01-01 03:00:00"), 5L)
    ).toDF("k", "ts", "v")
    val c = TimeSeriesOps.timeWeightedAvg(const, Seq("k"), "ts", "v").collect()
    assert(c.length == 1 && c(0).getDouble(1) == 5.0)
    // a long stretch at 10 dominates a brief spike to 100: one minute
    // at avg 10, then one second ramping 10->100 — twa must sit near
    // 10, where the row AVG (10+10+100)/3 = 40 over-weights the spike
    val spike = Seq(
      ("cpu", ts("2024-01-01 00:00:00"), 10L),
      ("cpu", ts("2024-01-01 00:01:00"), 10L),
      ("cpu", ts("2024-01-01 00:01:01"), 100L)
    ).toDF("k", "ts", "v")
    val tw = TimeSeriesOps.timeWeightedAvg(spike, Seq("k"), "ts", "v")
      .collect()(0).getDouble(1)
    // exact: (10*60 + 55*1) / 61
    assert(math.abs(tw - (10.0 * 60 + 55.0) / 61) < 1e-12, tw)
    // single observation: zero span, no time to weight -> null
    val one = Seq(("cpu", ts("2024-01-01 00:00:00"), 5L)).toDF("k", "ts", "v")
    assert(TimeSeriesOps.timeWeightedAvg(one, Seq("k"), "ts", "v")
      .collect()(0).isNullAt(1))
    // the lead() window and the aggregate share ONE key exchange
    val plan = TimeSeriesOps.timeWeightedAvg(spike, Seq("k"), "ts", "v")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"window+agg must reuse the key exchange:\n$plan")
  }

  test("funnel: strict ordering, within bound, monotone counts, one user exchange") {
    // u1 completes all four steps in order; u2 stalls at view (the
    // click PRECEDES the view, so strict ordering refuses it); u3's
    // purchase falls outside the within bound; u4 never signs up but
    // views/clicks anyway (counted nowhere — no step-0)
    val events = Seq(
      ("u1", "signup",   ts("2024-01-01 00:00:00")),
      ("u1", "view",     ts("2024-01-01 01:00:00")),
      ("u1", "click",    ts("2024-01-01 02:00:00")),
      ("u1", "purchase", ts("2024-01-01 03:00:00")),
      ("u2", "click",    ts("2024-01-02 00:30:00")),
      ("u2", "signup",   ts("2024-01-02 01:00:00")),
      ("u2", "view",     ts("2024-01-02 02:00:00")),
      ("u3", "signup",   ts("2024-01-03 00:00:00")),
      ("u3", "view",     ts("2024-01-03 01:00:00")),
      ("u3", "click",    ts("2024-01-03 02:00:00")),
      ("u3", "purchase", ts("2024-01-20 00:00:00")),
      ("u4", "view",     ts("2024-01-04 00:00:00")),
      ("u4", "click",    ts("2024-01-04 01:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = TimeSeriesOps.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase"),
      withinMicros = Some(7L * 86400L * 1000000L))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((0, "signup", 3L), (1, "view", 3L),
      (2, "click", 2L), (3, "purchase", 1L)), got.toSeq)
    // no within bound: u3's late purchase converts
    val open = TimeSeriesOps.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getLong(2))
    assert(open.toSeq == Seq(3L, 3L, 2L, 2L), open.toSeq)
    // a same-timestamp step does NOT advance (strictly after)
    val tie = Seq(
      ("u", "signup", ts("2024-01-01 00:00:00")),
      ("u", "view",   ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val tied = TimeSeriesOps.funnel(tie, "user_id", "event_type", "ts",
      Seq("signup", "view")).collect().map(r => r.getLong(2))
    assert(tied.toSeq == Seq(1L, 0L), tied.toSeq)
    // the stacked windows and the per-user reduction share ONE user
    // exchange (the per-step count tail is a single-partition agg)
    val plan = TimeSeriesOps.funnel(events, "user_id", "event_type", "ts",
      Seq("signup", "view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"funnel must reuse the user exchange:\n$plan")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.funnel(events, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.funnel(events, "user_id", "event_type", "ts",
        Seq("a", "a"))
    }
  }

  test("retentionCohorts: first-seen day cohorts, offset triangle") {
    val events = Seq(
      ("u1", ts("2024-01-01 09:00:00")),
      ("u1", ts("2024-01-02 09:00:00")),
      ("u1", ts("2024-01-02 18:00:00")), // same day twice: counted once
      ("u1", ts("2024-01-05 09:00:00")),
      ("u2", ts("2024-01-01 12:00:00")),
      ("u2", ts("2024-01-05 12:00:00")),
      ("u3", ts("2024-01-02 00:00:00"))
    ).toDF("user_id", "ts")
    val got = TimeSeriesOps.retentionCohorts(events, "user_id", "ts", 30)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 4, 2L),
      ("2024-01-02", 0, 1L)), got.toSeq)
    // maxOffsetDays cuts the triangle
    val cut = TimeSeriesOps.retentionCohorts(events, "user_id", "ts", 1)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(cut.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-02", 0, 1L)),
      cut.toSeq)
  }

  test("ewmaBucketed stitches to the single-pass recurrence (~1e-9)") {
    import org.apache.spark.sql.functions._
    // 400 points over ~14 days on one key, irregular spacing: the
    // bucketed two-phase decomposition must agree with the sequential
    // kernel to floating-point reassociation tolerance
    val pts = (0 until 400).map { i =>
      ("k", new Timestamp(1704067200000L + i.toLong * 3137 * 1000 +
        (i % 7) * 111), math.sin(i * 0.37) * 50 + (i % 13))
    }
    val df = pts.toDF("k", "ts", "v")
    val single = TimeSeriesOps.ewma(df, "k", "ts", "v",
      tieBreak = Seq.empty, alpha = 0.3)
      .select(col("ts"), col("ewma")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getDouble(1))).toMap
    val bucketed = TimeSeriesOps.ewmaBucketed(df, "k", "ts", "v",
      tieBreak = Seq.empty, alpha = 0.3, bucketSeconds = 86400L)
      .select(col("ts"), col("ewma")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getDouble(1)))
    assert(bucketed.length == single.size)
    bucketed.foreach { case (t, v) =>
      val e = single(t)
      assert(math.abs(v - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"$t: $v vs $e")
    }
    // alpha = 1: no memory — both forms emit the raw value exactly
    val a1 = TimeSeriesOps.ewmaBucketed(df, "k", "ts", "v",
      tieBreak = Seq.empty, alpha = 1.0, bucketSeconds = 86400L)
      .select(col("v"), col("ewma")).collect()
    assert(a1.forall(r => r.getDouble(0) == r.getDouble(1)))
    // phase 1/3 partition by (key, bucket): the plan must hash on BOTH
    // columns somewhere (the hot-key fan-out), and phase 2 on the key
    val plan = TimeSeriesOps.ewmaBucketed(df, "k", "ts", "v",
      tieBreak = Seq.empty, alpha = 0.3, bucketSeconds = 86400L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bk"), s"bucketed phase must key on (k, __bk):\n$plan")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.ewmaBucketed(df, "k", "ts", "v", Seq.empty, 0.3, 0L)
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.ewmaBucketed(df, "k", "ts", "v", Seq.empty, 1.5, 60L)
    }
  }

  test("holtStitched matches the single-pass Holt kernel (~1e-9) incl. " +
      "nulls, null keys, all-null buckets, and the forecast form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.{
      Ascending, SortOrder, UnspecifiedFrame, WindowExpression,
      WindowSpecDefinition}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // two keys + a NULL key, 300 irregular points each with planted
    // null-value runs (incl. one whole day of nulls on key "a" — the
    // all-null-bucket identity composition)
    val pts = (0 until 900).map { i =>
      val key = i % 3 match {
        case 0 => Some("a"); case 1 => Some("b"); case _ => None
      }
      val t = new Timestamp(1704067200000L + (i / 3).toLong * 9257 * 1000)
      val dayIdx = (i / 3).toLong * 9257 / 86400
      val v: Option[Double] =
        if (key.contains("a") && dayIdx == 3) None // all-null day
        else if (i % 11 == 0) None                  // scattered nulls
        else Some(math.sin(i * 0.29) * 40 + (i % 17))
      (key, t, v)
    }
    val df = pts.toDF("k", "ts", "v")
    def single(forecast: Boolean) = {
      val we = ColumnBridge.column(WindowExpression(
        graft.functions.Holt(
          ColumnBridge.expression(col("v").cast("double")),
          0.35, 0.2, forecast),
        WindowSpecDefinition(
          Seq(ColumnBridge.expression(col("k"))),
          Seq(SortOrder(ColumnBridge.expression(col("ts")), Ascending)),
          UnspecifiedFrame)))
      df.withColumn("h", we)
        .select(col("k"), col("ts"), col("h")).collect()
        .map(r => ((Option(r.getString(0)), r.getTimestamp(1).getTime),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    }
    for (forecast <- Seq(false, true)) {
      val exp = single(forecast)
      val got = TimeSeriesOps.holtStitched(df, Seq("k"), "ts", "v",
        tieBreak = Seq.empty, alpha = 0.35, beta = 0.2,
        bucketUs = 86400L * 1000000L, forecast = forecast, out = "h")
        .select(col("k"), col("ts"), col("h")).collect()
        .map(r => ((Option(r.getString(0)), r.getTimestamp(1).getTime),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(got.length == exp.size)
      got.foreach { case (key, v) =>
        val e = exp(key)
        assert(v.isDefined == e.isDefined, s"$key null pattern: $v vs $e")
        for (a <- v; b <- e)
          assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
            s"$key (forecast=$forecast): $a vs $b")
      }
    }
    // phases hash on (key, bucket) — the hot-key fan-out
    val plan = TimeSeriesOps.holtStitched(df, Seq("k"), "ts", "v",
      Seq.empty, 0.35, 0.2, 86400L * 1000000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bk"), s"stitched phases must key on __bk:\n$plan")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.holtStitched(df, Seq("k"), "ts", "v", Seq.empty,
        0.35, 1.2, 60L)
    }
  }

  test("multi-output stitch (shared pipeline for fit+forecast faces) " +
      "is BIT-EQUAL to per-face single calls") {
    import org.apache.spark.sql.functions._
    val pts = (0 until 600).map { i =>
      val key = if (i % 2 == 0) Some("a") else Some("b")
      val t = new Timestamp(1704067200000L + (i / 2).toLong * 9257 * 1000)
      val v: Option[Double] =
        if (i % 13 == 0) None else Some(math.cos(i * 0.31) * 25 + (i % 7))
      (key, t, v)
    }
    val df = pts.toDF("k", "ts", "v")
    def cmp(multi: org.apache.spark.sql.DataFrame,
        singles: Seq[(String, org.apache.spark.sql.DataFrame)]): Unit = {
      def m(d: org.apache.spark.sql.DataFrame, c: String) = d
        .select(col("k"), col("ts"), col(c)).collect()
        .map(r => ((r.getString(0), r.getTimestamp(1).getTime),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      singles.foreach { case (c, s) =>
        val exp = m(s, c); val got = m(multi, c)
        assert(got.size == exp.size)
        // exact comparison: the shared pipeline evaluates the SAME
        // finish expression over the SAME joined rows as the single
        // call — any drift means the faces stopped sharing state
        got.foreach { case (key, v) => assert(v == exp(key), s"$c $key") }
      }
    }
    val bUs = 86400L * 1000000L
    cmp(
      TimeSeriesOps.holtStitchedMulti(df, Seq("k"), "ts", "v", Seq.empty,
        0.5, 0.25, bUs, Seq(("fit", false), ("fc", true))),
      Seq(
        "fit" -> TimeSeriesOps.holtStitched(df, Seq("k"), "ts", "v",
          Seq.empty, 0.5, 0.25, bUs, forecast = false, out = "fit"),
        "fc" -> TimeSeriesOps.holtStitched(df, Seq("k"), "ts", "v",
          Seq.empty, 0.5, 0.25, bUs, forecast = true, out = "fc")))
    cmp(
      TimeSeriesOps.holtWintersStitchedMulti(df, Seq("k"), "ts", "v",
        Seq.empty, 0.5, 0.25, 0.25, 4, bUs,
        Seq(("fit", false), ("fc", true))),
      Seq(
        "fit" -> TimeSeriesOps.holtWintersStitched(df, Seq("k"), "ts",
          "v", Seq.empty, 0.5, 0.25, 0.25, 4, bUs, forecast = false,
          out = "fit"),
        "fc" -> TimeSeriesOps.holtWintersStitched(df, Seq("k"), "ts",
          "v", Seq.empty, 0.5, 0.25, 0.25, 4, bUs, forecast = true,
          out = "fc")))
    intercept[IllegalArgumentException] {
      TimeSeriesOps.holtStitchedMulti(df, Seq("k"), "ts", "v", Seq.empty,
        0.5, 0.25, bUs, Seq.empty)
    }
  }
}
