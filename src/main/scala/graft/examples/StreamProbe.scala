package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe (round 15): does an AvailableNow replay of a
  * stream-stream LEFT OUTER join emit the null-extended unmatched rows
  * at end of stream, and does a window-agg-over-join (multiple stateful
  * operators) emit its final windows? Exercises the flush-row idea:
  * a far-future sentinel row appended last advances the watermark past
  * all real data.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    // two "days" of data + optional flush file
    val day1 = Seq(
      ("click", "2024-01-01 10:00:00", "u1", 1L),
      ("click", "2024-01-01 11:00:00", "u2", 2L),
      ("purchase", "2024-01-01 10:30:00", "u1", 3L))
    val day2 = Seq(
      ("click", "2024-01-02 10:00:00", "u3", 4L),
      ("purchase", "2024-01-02 10:20:00", "u3", 5L),
      ("click", "2024-01-02 12:00:00", "u4", 6L))
    def write(rows: Seq[(String, String, String, Long)], f: String): Unit =
      rows.toDF("typ", "tss", "user", "id")
        .select(col("typ"), to_timestamp(col("tss")).as("ts"), col("user"), col("id"))
        .coalesce(1).write.mode("append").parquet(s"$dir/$f")
    write(day1, "data"); Thread.sleep(1100); write(day2, "data")
    val withFlush = args.headOption.contains("flush")
    if (withFlush) {
      Thread.sleep(1100)
      // one flush row PER SIDE: each must survive that side's series
      // filter (pushed below the watermark node), far enough apart to
      // never join each other
      write(Seq(("click", "2024-03-01 00:00:00", "__flush__", 99L),
        ("purchase", "2024-03-08 00:00:00", "__flush__", 98L)), "data")
    }

    val schema = spark.read.parquet(s"$dir/data").schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/data")
    val clicks = src.withWatermark("ts", "10 minutes")
      .filter(col("typ") === "click")
      .select(col("user").as("cu"), col("ts").as("cts"), col("id").as("cid"))
    val buys = src.withWatermark("ts", "10 minutes")
      .filter(col("typ") === "purchase")
      .select(col("user").as("pu"), col("ts").as("pts"), col("id").as("pid"))
    val joined = clicks.join(buys,
      col("cu") === col("pu") && col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"), "left_outer")
    val sink = "probe_lj"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("=== LEFT OUTER rows (flush=" + withFlush + ") ===")
    spark.table(sink).orderBy("cid").show(20, false)

    // multiple stateful: join -> windowed agg (append)
    val joined2 = clicks.join(buys,
      col("cu") === col("pu") && col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
    val agg = joined2.groupBy(window(col("cts"), "1 day"))
      .agg(count(lit(1)).as("n"))
    val sink2 = "probe_ja"
    val q2 = agg.writeStream.format("memory").queryName(sink2)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    println("=== JOIN+AGG windows (flush=" + withFlush + ") ===")
    spark.table(sink2).orderBy("window").show(20, false)
    spark.stop()
  }
}
