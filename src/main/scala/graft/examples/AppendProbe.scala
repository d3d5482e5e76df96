package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement scratch (optimization round 18): time the
  * date-partitioned family append — the fixture seed every mutate
  * roundtrip and stream replay pays — under commit/shuffle variations,
  * to find where its fixed floor lives at bench scale.
  *
  * Usage: runMain graft.examples.AppendProbe <sfDir>
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fam = graft.sources.TimeSeriesTable.fromEvents(
      graft.tables.Tables.events(spark, sfDir))
    fam.count()

    def time(tag: String)(body: String => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val dir = java.nio.file.Files.createTempDirectory("graft_ap").toString
        val t0 = System.nanoTime()
        body(dir)
        val dt = (System.nanoTime() - t0) / 1e9
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(dir))
        dt
      }.sorted
      println(f"APPEND $tag%-28s median ${ts(2)}%.3f s  (min ${ts.head}%.3f max ${ts.last}%.3f)")
    }

    time("current")(dir =>
      graft.sources.TimeSeriesTable.append(fam, dir, "dom", "events"))

    time("committer_v2") { dir =>
      fam.withColumn("dt", to_date(col("ts")))
        .repartition(col("dt"))
        .sortWithinPartitions("series", "ts")
        .write.partitionBy("dt").mode("append")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(s"$dir/dom/events")
    }

    time("coalesce1") { dir =>
      fam.withColumn("dt", to_date(col("ts")))
        .coalesce(1)
        .sortWithinPartitions("dt", "series", "ts")
        .write.partitionBy("dt").mode("append")
        .parquet(s"$dir/dom/events")
    }

    time("coalesce1_v2") { dir =>
      fam.withColumn("dt", to_date(col("ts")))
        .coalesce(1)
        .sortWithinPartitions("dt", "series", "ts")
        .write.partitionBy("dt").mode("append")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(s"$dir/dom/events")
    }

    time("nosort") { dir =>
      fam.withColumn("dt", to_date(col("ts")))
        .repartition(col("dt"))
        .write.partitionBy("dt").mode("append")
        .parquet(s"$dir/dom/events")
    }

    // does fanning out the RAW events (narrow rows, one 2 MB row group
    // = one scan task) before the expensive decode parallelize the
    // transform for less than the extra exchange costs?
    val rawFan = graft.sources.TimeSeriesTable.fromEvents(
      graft.tables.Tables.events(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism))
    time("fanout_raw")(dir =>
      graft.sources.TimeSeriesTable.append(rawFan, dir, "dom", "events"))

    locally {
      def med(body: => Unit): Double = {
        val ts = (1 to 5).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(2)
      }
      println(f"DECOMP fan_transform_noop     ${med(rawFan.write.format("noop").mode("overwrite").save())}%.3f s")
      val noJson = graft.tables.Tables.events(spark, sfDir).select(
        col("event_type").as("series"), col("ts"), col("value"),
        map(lit("user"), col("user_id").cast("string")).as("attributes"))
      println(f"DECOMP nojson_noop            ${med(noJson.write.format("noop").mode("overwrite").save())}%.3f s")
    }

    // decomposition: how much of the floor is the fromEvents transform
    // (scan + unpivot) vs the dt shuffle vs the parquet write?
    locally {
      def med(body: => Unit): Double = {
        val ts = (1 to 5).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(2)
      }
      val withDt = fam.withColumn("dt", to_date(col("ts")))
      println(f"DECOMP transform_count        ${med(withDt.count())}%.3f s")
      println(f"DECOMP transform_noop         ${med(withDt.write.format("noop").mode("overwrite").save())}%.3f s")
      println(f"DECOMP shuffle_sort_noop      ${med(withDt.repartition(col("dt")).sortWithinPartitions("series", "ts").write.format("noop").mode("overwrite").save())}%.3f s")
      val flat = withDt.repartition(col("dt")).sortWithinPartitions("series", "ts")
      println(f"DECOMP write_unpartitioned    ${med{
        val d = java.nio.file.Files.createTempDirectory("graft_apw").toString
        flat.write.mode("append").parquet(s"$d/x")
      }}%.3f s")
      println(f"DECOMP write_partitioned      ${med{
        val d = java.nio.file.Files.createTempDirectory("graft_apw").toString
        flat.write.partitionBy("dt").mode("append").parquet(s"$d/x")
      }}%.3f s")
    }

    // how many files / partitions does the current shape produce?
    val dir = java.nio.file.Files.createTempDirectory("graft_ap").toString
    graft.sources.TimeSeriesTable.append(fam, dir, "dom", "events")
    val root = new java.io.File(s"$dir/dom/events")
    val dts = Option(root.listFiles()).getOrElse(Array.empty).count(_.getName.startsWith("dt="))
    val files = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("dt="))
      .map(d => Option(d.listFiles()).map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)).sum
    println(s"LAYOUT dt_partitions=$dts parquet_files=$files rows=${fam.count()}")
    spark.stop()
  }
}
