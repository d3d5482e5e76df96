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

  test("KMV sketches merge losslessly: union of per-group sketches = whole-column sketch") {
    val merged = SketchOps.kmvUnionAll(li, "l_returnflag", "l_partkey")
      .collect()(0)
    // bottom-k of the union is exactly the bottom-k of the bottom-ks,
    // so the merged estimate must EQUAL the single-pass global sketch
    // (constant group), not just approximate it
    val whole = SketchOps.kmvDistinct(
        li.withColumn("__all", lit(1)), "__all", "l_partkey")
      .collect()(0)
    assert(merged.getLong(0) == whole.getLong(1))
    assert(merged.getLong(1) == whole.getLong(2))
    assert(merged.getDouble(2) == whole.getDouble(3))
    // and it lands within KMV error of the exact global count
    val global = li.agg(countDistinct("l_partkey")).collect()(0).getLong(0)
    assert(math.abs(merged.getDouble(2) - global) / global <
      5.0 / math.sqrt(62.0), s"merged ${merged.getDouble(2)} vs exact $global")
  }

  test("KMV partial aggregation is k-capped: the plan shuffles sketches, not distinct values") {
    val df = SketchOps.kmvDistinct(li, "l_returnflag", "l_partkey")
    df.collect()
    // the AQE plan string prints the initial plan after the final one —
    // assert on the final plan only (an Exchange appears in both)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the native TypedImperativeAggregate plans as ObjectHashAggregate
    // with a partial pass BELOW the exchange (k-capped task output) and
    // NO separate distinct/expand pass shuffling raw hash values
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_graft_kmv_sketch"),
      s"partial (map-side) sketch pass missing — the shuffle would carry raw values:\n$plan")
    assert(!plan.contains("WindowGroupLimit"),
      "old window formulation resurfaced")
    assert(
      "Exchange".r.findAllIn(plan).size == 1,
      s"exactly one exchange expected (group-key shuffle of sketches):\n$plan")
  }

  test("sampledPercentile partial aggregation ships k pairs, not rows") {
    val ev = Tables.events(spark, sfDir)
    val df = SketchOps.sampledPercentile(ev, "event_type", "value", "event_id", 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // same contract as the KMV distinct sketch: partial object-hash
    // pass below the one exchange, k-capped task output
    assert(plan.contains("partial_graft_kmv_sample"),
      s"partial (map-side) sample pass missing — the shuffle would carry raw rows:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"exactly one exchange expected (group-key shuffle of k-pair sketches):\n$plan")
  }

  test("KmvSketchAgg equals brute-force bottom-k distinct for random data") {
    import graft.functions.GraftFunctions
    val rnd = new scala.util.Random(42)
    // duplicates, negatives-free 32-bit-range values, group skew
    val rows = Seq.tabulate(5000) { i =>
      (s"g${i % 3}", rnd.nextInt(500).toLong)
    }
    val df = rows.toDF("g", "h")
    for (k <- Seq(2, 16, 64)) {
      val got = df.groupBy("g").agg(GraftFunctions.kmvSketch(col("h"), k).as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      val want = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted.take(k)).toMap
      assert(got == want, s"k=$k")
    }
    // repartitioning (different partial/merge orders) changes nothing
    val a = df.repartition(17).groupBy("g")
      .agg(GraftFunctions.kmvSketch(col("h"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val b = df.coalesce(1).groupBy("g")
      .agg(GraftFunctions.kmvSketch(col("h"), 64).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(a == b)
  }

  test("KmvMergeAgg unions arbitrary sketch arrays: unsorted input, nulls, k-cap") {
    import graft.functions.GraftFunctions
    // deliberately UNSORTED arrays with duplicates across rows and a
    // null element/row — the aggregate promises bottom-k of the union
    // for any array<long> input, not just KmvSketchAgg outputs
    val df = Seq(
      Seq(50L, 10L, 30L),
      Seq(20L, 10L, 60L),
      Seq(5L, 70L, 20L)
    ).toDF("sk").union(Seq.empty[Seq[Long]].toDF("sk"))
      .union(Seq(null.asInstanceOf[Seq[Long]]).toDF("sk"))
    for (k <- Seq(2, 4, 64)) {
      val got = df.agg(GraftFunctions.kmvMerge(col("sk"), k).as("m"))
        .collect()(0).getSeq[Long](0).toSeq
      val want = Seq(50L, 10L, 30L, 20L, 60L, 5L, 70L).distinct.sorted.take(k)
      assert(got == want, s"k=$k")
    }
    // partitioning invariance (different merge orders)
    val a = df.repartition(7).agg(GraftFunctions.kmvMerge(col("sk"), 4))
      .collect()(0).getSeq[Long](0).toSeq
    assert(a == Seq(5L, 10L, 20L, 30L))
  }

  test("two-level sketch rollup plans partial+final object aggregates, no raw-value shuffle") {
    // the kmvUnionAll plan: level 1 groups raw values into per-group
    // sketches (partial graft_kmv_sketch below the exchange), level 2
    // unions the sketch COLUMN (graft_kmv_merge) — at no point does an
    // exchange carry raw hash values or an explode resurface
    val df = SketchOps.kmvUnionAll(li, "l_returnflag", "l_partkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("partial_graft_kmv_sketch"),
      s"level-1 map-side sketch pass missing:\n$plan")
    assert(plan.contains("graft_kmv_merge"),
      s"level-2 sketch union missing:\n$plan")
    assert(!plan.contains("Explode") && !plan.contains("Generate"),
      s"sketch union must not explode sketches back into rows:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
  }

  test("freqSketch: exact below capacity, MG undercount bound above it") {
    import graft.functions.GraftFunctions.{freqSketch, freqMerge}
    // skewed synthetic stream: item i appears (101 - i) times, i in 1..100
    val rows = (1 to 100).flatMap(i => Seq.fill(101 - i)(f"item$i%03d"))
    val n = rows.length
    val df = spark.createDataset(new scala.util.Random(42).shuffle(rows))(
      org.apache.spark.sql.Encoders.STRING).toDF("x").repartition(7)
    def topOf(cap: Int): Map[String, Long] =
      df.agg(freqSketch(col("x"), cap).as("s")).collect()(0)
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacity >= distinct: exact counts
    val exactTop = topOf(128)
    assert(exactTop.size == 100 &&
      (1 to 100).forall(i => exactTop(f"item$i%03d") == 101L - i))
    // capacity 20 << 100 distinct: every stored count undercounts by at
    // most n/(cap+1), and every key above that bound is present
    val cap = 20
    val approx = topOf(cap)
    val bound = n / (cap + 1)
    assert(approx.forall { case (item, est) =>
      val truth = 101L - item.drop(4).toInt
      est <= truth && truth - est <= bound
    })
    (1 to 100).filter(i => 101 - i > bound).foreach(i =>
      assert(approx.contains(f"item$i%03d"), s"heavy item$i missing"))
    // merge law in the exact regime: per-slice sketches union to the
    // direct sketch (counts sum exactly below capacity)
    val perSlice = df.withColumn("g", pmod(crc32(col("x")), lit(5)))
      .groupBy("g").agg(freqSketch(col("x"), 128).as("s"))
    val merged = perSlice.agg(freqMerge(col("s"), 128).as("m"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == exactTop)
    // deterministic under repartitioning (exact regime)
    assert(df.repartition(31).agg(freqSketch(col("x"), 128))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0).map(
        r => r.getString(0) -> r.getLong(1)).toMap == exactTop)
  }

  test("freqSketch partial aggregation ships capped summaries, not value counts") {
    import graft.functions.GraftFunctions.freqSketch
    val df = Tables.events(spark, sfDir)
    val q = df.groupBy("event_type")
      .agg(freqSketch(col("user_id").cast("string"), 64).as("s"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("partial_graft_freq_sketch"),
      s"partial (map-side) summary pass missing:\n$plan")
    assert("graft_freq_sketch".r.findAllIn(plan).size >= 2,
      s"final summary pass missing:\n$plan")
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

  test("approxQuantiles: rank error within 1/accuracy of exact, deterministic") {
    val probs = Seq(0.25, 0.5, 0.9)
    val accuracy = 200
    def runOn(df: org.apache.spark.sql.DataFrame) =
      SketchOps.approxQuantiles(df, "l_returnflag", "l_extendedprice",
          probs, accuracy)
        .collect().map(r => r.getString(0) ->
          ((r.getSeq[Double](1), r.getLong(2)))).toMap
    val got = runOn(li)
    val sorted = li.select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (g, (qs, n)) =>
      val vals = sorted(g)
      assert(n == vals.length.toLong)
      probs.zip(qs).foreach { case (p, q) =>
        // the returned value must be an element whose RANK is within
        // n/accuracy of the target rank (the GK contract)
        val lo = vals.count(_ < q)      // lowest rank q could hold
        val hi = vals.count(_ <= q) - 1 // highest rank q holds
        val target = p * (vals.length - 1)
        val slack = vals.length.toDouble / accuracy + 1
        assert(target >= lo - slack && target <= hi + slack,
          s"group $g p=$p: value $q rank [$lo,$hi] vs target $target ± $slack")
        assert(vals.contains(q), s"$q must be an actual element of group $g")
      }
    }
    // repeatable: no sampling, so the same input plan gives the same
    // elements every run. (A DIFFERENT partitioning may merge summaries
    // in another order and legally pick a different in-bound element —
    // the rank contract above is the invariant, and it holds for any
    // partitioning:)
    assert(runOn(li) == got)
    runOn(li.repartition(17)).foreach { case (g, (qs, n)) =>
      assert(n == sorted(g).length.toLong)
      assert(qs.forall(sorted(g).contains), s"group $g: in-group elements only")
    }
  }

  test("sampledPercentile: partitioning-invariant, exact below k, rank-bounded above") {
    val ev = Tables.events(spark, sfDir)
    def runOn(df: org.apache.spark.sql.DataFrame, k: Int) =
      SketchOps.sampledPercentile(df, "event_type", "value", "event_id",
          0.5, k)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // the bottom-k-by-hash sample is a DETERMINISTIC set, so unlike GK
    // the estimate itself (not just its rank bound) is invariant under
    // any partitioning — the property that makes it oracle-checkable
    val got = runOn(ev, 256)
    assert(runOn(ev.repartition(17), 256) == got)
    assert(runOn(ev.repartition(1), 256) == got)
    val sorted = ev.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // k >= group size: the sample IS the group, estimate = exact median
    val kBig = sorted.values.map(_.length).max + 1
    runOn(ev, kBig).foreach { case (g, (n, est)) =>
      val vals = sorted(g)
      assert(n == vals.length.toLong)
      val r = 0.5 * (vals.length - 1)
      val exactMedian = vals(r.toInt) +
        (vals(math.min(r.toInt + 1, vals.length - 1)) - vals(r.toInt)) * (r - r.toInt)
      assert(math.abs(est.get - exactMedian) < 1e-6,
        s"$g: full sample must reproduce the exact median")
    }
    // k < group size: estimate's RANK in the true distribution within
    // ~4 standard errors of the median (se = sqrt(p(1-p)/k))
    got.foreach { case (g, (n, est)) =>
      assert(n == math.min(256, sorted(g).length).toLong)
      val vals = sorted(g)
      val rankFrac = vals.count(_ <= est.get).toDouble / vals.length
      assert(math.abs(rankFrac - 0.5) < 4 * math.sqrt(0.25 / 256),
        s"$g: sampled median at rank $rankFrac")
    }
  }
}
