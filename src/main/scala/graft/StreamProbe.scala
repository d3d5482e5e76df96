package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement tool (optimization rounds): run selected streaming
  * replays with a StreamingQueryListener attached and print each
  * micro-batch's progress JSON (batch id, durationMs breakdown, state
  * operator commit times) — the per-batch decomposition the bench's
  * end-to-end seconds cannot show.
  *
  * Usage: runMain graft.StreamProbe <sfDir> <name1,name2,...>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSet
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"QSTART ${e.name} ${System.currentTimeMillis()}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"QPROGRESS ${e.progress.json}")
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"QEND ${System.currentTimeMillis()}")
    })
    val selected = SparkEntry.queries.view.filterKeys(names).toMap
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"QUERY $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
