package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the external testdata contract: `Tables.events` must yield
  * `ts: TimestampType` with identical instant values no matter which
  * physical unit the harness wrote the parquet in. The unit has already
  * drifted once (round 9: TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/NTZ
  * overnight, which silently broke 77 queries at driver time) — this
  * spec makes the next drift a single red test with an obvious name.
  */
class TablesContractSpec extends SparkSpec {

  // one row set, written three ways; instants chosen micro-precision
  private val instantsUs = Seq(
    1700000000000000L, // 2023-11-14T22:13:20Z
    1700000123456789L,
    1700086400000000L)

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-contract-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
      tsType: DataType): Unit = {
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize(instantsUs.zipWithIndex.map {
        case (us, i) => Row(i.toLong, us, s"et$i", i.toDouble)
      }),
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("us", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType))))
    base.select(col("event_id"), tsCol.cast(tsType).as("ts"),
        col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readBack(dir: String): (DataType, Seq[(Long, Long)]) = {
    val df = Tables.events(spark, dir)
    (df.schema("ts").dataType,
      df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  private val expected = instantsUs.zipWithIndex.map { case (us, i) => (i.toLong, us) }

  test("events.ts contract: nanos-as-long, NTZ-micros, and adjusted TIMESTAMP all normalize identically") {
    val asLong = tmp("long")
    writeEvents(asLong, col("us") * lit(1000L), LongType) // raw nanos longs
    val asNtz = tmp("ntz")
    writeEvents(asNtz, timestamp_micros(col("us")).cast(TimestampNTZType), TimestampNTZType)
    val asTs = tmp("ts")
    writeEvents(asTs, timestamp_micros(col("us")), TimestampType)

    for (dir <- Seq(asLong, asNtz, asTs)) {
      val (dt, rows) = readBack(dir)
      assert(dt == TimestampType, s"$dir: ts must normalize to TimestampType, got $dt")
      assert(rows == expected, s"$dir: instants drifted through normalization")
    }
  }

  test("normalizeEventsTs preserves column order and rejects unknown ts types") {
    import spark.implicits._
    val ntz = Seq((1L, "a")).toDF("event_id", "x")
      .withColumn("ts", timestamp_micros(lit(42L)).cast(TimestampNTZType))
      .select("event_id", "ts", "x")
    assert(Tables.normalizeEventsTs(ntz).columns.toSeq == Seq("event_id", "ts", "x"))

    val bad = Seq((1L, "oops")).toDF("event_id", "ts")
    assertThrows[IllegalStateException](Tables.normalizeEventsTs(bad))
  }

  test("the real sf0.001 events table loads as TimestampType with rows") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }

  test("flagship SparkEntry.entry executes on sf0.001 with rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
