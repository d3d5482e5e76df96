package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TimeSeriesTable
import graft.tables.Tables

/** Measure the two candidate 100 TB layouts against each other
  * (SURVEY §7.4.4): date-partitioned parquet sorted by (series, ts)
  * within partitions, vs the same plus series-hash bucketing. Both are
  * written from a deterministic 10x replication of the sf0.1 events
  * family, then three read shapes run on each (median of N):
  *
  *  - point:   series equality + time range (the reference's
  *             FetchSeries shape) — bucketed adds bucket pruning on
  *             top of row-group stats;
  *  - agg:     series-keyed aggregation — bucketed avoids the exchange;
  *  - selfjoin: series-aligned self-join — bucketed avoids BOTH sides'
  *             exchanges.
  *
  * Emits BENCH_layout.json with per-shape times and whether the agg
  * plan actually dropped its exchange.
  */
object LayoutBench {

  private def replicate(fam: DataFrame, reps: Int): DataFrame =
    (0 until reps).map { k =>
      fam.withColumn("attributes",
        map_concat(col("attributes"), map(lit("rep"), lit(k.toString))))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outJson = args.headOption.getOrElse("BENCH_layout.json")
    val root = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_DIR", "/tmp/graft_layout10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "10").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "7").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC contract: Tables.events' NTZ→instant reinterpretation
      // (normalizeEventsTs) depends on the session timezone
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet loads as raw longs instead of throwing
      // (session-level config, set beside the UTC pin; Tables loaders are
      // conf-write free — see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$root/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bucketTable = "graft_dom_events_bucketed"
    if (!Files.exists(Paths.get(s"$root/dom/events"))) {
      System.err.println(s"[layout] writing both ${reps}x layouts under $root")
      val fam10 = replicate(TimeSeriesTable.fromEvents(Tables.events(spark, baseDir)), reps)
      TimeSeriesTable.append(fam10, root, "dom", "events")
      TimeSeriesTable.appendBucketed(fam10, root, "dom", "events")
    } else if (!spark.catalog.tableExists(bucketTable)) {
      // fresh session over an existing layout: re-register the external
      // bucketed table (catalog metadata does not outlive the metastore)
      TimeSeriesTable.appendBucketed(
        TimeSeriesTable.open(spark, root, "dom", "events").limit(0),
        root, "dom", "events")
    }

    val sorted = TimeSeriesTable.open(spark, root, "dom", "events")
    val bucketed = TimeSeriesTable.openBucketed(spark, bucketTable)

    def shapes(df: DataFrame): Map[String, (SparkSession, String) => DataFrame] = Map(
      "point" -> ((_, _) => df.filter(col("series") === "click" &&
        col("ts") >= "2024-01-10" && col("ts") < "2024-01-12")),
      "agg" -> ((_, _) => df.groupBy("series")
        .agg(count(lit(1)).as("n"), avg("value").as("avg_value"))),
      "selfjoin" -> ((_, _) => {
        val a = df.filter(col("value") > 100.0).select("series", "ts", "value")
        val b = df.filter(col("value") > 200.0)
          .select(col("series"), col("ts").as("ts2"), col("value").as("v2"))
        a.join(b, Seq("series")).filter(col("ts") === col("ts2"))
          .groupBy("series").agg(count(lit(1)).as("pairs"))
      }))

    // does the series-keyed agg still pay an exchange on each layout?
    def aggHasExchange(df: DataFrame): Boolean = {
      val agg = df.groupBy("series").agg(count(lit(1)))
      agg.collect()
      agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning(series")
    }

    System.err.println("[layout] benching sorted layout")
    val (sortedT, sortedF) = Bench.run(spark, baseDir, shapes(sorted), iters)
    System.err.println("[layout] benching bucketed layout")
    val (bucketT, bucketF) = Bench.run(spark, baseDir, shapes(bucketed), iters)
    val exSorted = aggHasExchange(sorted)
    val exBucketed = aggHasExchange(bucketed)

    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")
    val json =
      s"""{"base_sf":"$baseDir","layout_root":"$root","reps":$reps,"iters":$iters,""" +
      s""""sorted":${jmap(sortedT)},"bucketed":${jmap(bucketT)},""" +
      s""""agg_exchange_sorted":$exSorted,"agg_exchange_bucketed":$exBucketed,""" +
      s""""failed":${(sortedF ++ bucketF).map { case (k, m) =>
        s""""$k":"${m.replace("\"", "'")}"""" }.mkString("{", ",", "}")}}"""
    Files.writeString(Paths.get(outJson), json + "\n")
    println(json)
    spark.stop()
    if (sortedF.nonEmpty || bucketF.nonEmpty) sys.exit(2)
  }
}
