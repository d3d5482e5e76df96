package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Streaming/batch parity: the AvailableNow replay of the events table
  * through Structured Streaming must equal the equivalent batch query.
  */
class StreamingSpec extends SparkSpec {

  test("streamed windowed agg equals batch groupBy") {
    val streamed = StreamingOps.windowedAggReplay(spark, sfDir).collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start_us", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("readStream → transform → writeStream lands a readable family") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    StreamingOps.streamIntoFamily(spark, sfDir, root, "dom", "events")
    val back = graft.sources.TimeSeriesTable.open(spark, root, "dom", "events")
    val batch = graft.sources.TimeSeriesTable.fromEvents(Tables.events(spark, sfDir))
    assert(back.count() == batch.count())
    val a = back.groupBy("series").count().orderBy("series").collect().toSeq
    val b = batch.groupBy("series").count().orderBy("series").collect().toSeq
    assert(a == b)
  }

  test("streaming dedup count equals batch distinct count") {
    val streamed = StreamingOps.streamingDedupCounts(spark, sfDir).collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct("event_id").as("n"))
      .orderBy("event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("repeated streaming calls stage exactly one temp dir per sfDir") {
    def stagedDirs: Int = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("graft-stream") &&
        !f.getName.startsWith("graft-stream-sink"))
    StreamingOps.streamingDedupCounts(spark, sfDir).count()
    val after1 = stagedDirs
    StreamingOps.streamingDedupCounts(spark, sfDir).count()
    StreamingOps.windowedAggReplay(spark, sfDir).count()
    assert(stagedDirs == after1, "repeat calls must reuse the cached staged dir")
  }
}
