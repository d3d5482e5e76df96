package graft.examples

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Time individual queries: runMain graft.examples.TimeQuery <sfDir> <name...> */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet loads as raw longs instead of throwing
      // (session-level config, set beside the UTC pin; Tables loaders are
      // conf-write free — see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      println(f"TIMER $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$cnt")
    }
    spark.stop()
  }
}
