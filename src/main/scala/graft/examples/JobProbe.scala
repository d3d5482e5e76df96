package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Measurement tool (optimization rounds): run named declared queries
  * once under the bench session config and print every Spark job the
  * run submits — start offset, wall seconds, and the job's call site —
  * so a multi-second query's time can be attributed to its constituent
  * passes (guide §1.1 empirical loop) without the Spark UI.
  *
  * Usage: runMain graft.examples.JobProbe <sfDir> <name1,name2,...>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(id: Int, t0: Long, desc: String)
    val open = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    @volatile var rows = List.empty[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        open.put(js.jobId, J(js.jobId, js.time, d))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(open.remove(je.jobId)).foreach { j =>
          rows ::= ((j.id, j.t0, je.time, j.desc))
        }
      }
    })
    // warm like the bench does
    Seq("events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "3").toInt
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          // warm iterations absorb JIT/codegen like the bench median does
          (1 until iters).foreach(_ => fn(spark, sfDir).count())
          rows = Nil
          val w0 = System.nanoTime()
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - w0) / 1e9
          // settle listener delivery (bus is private; a short sleep is
          // plenty for a single-process probe)
          Thread.sleep(300)
          val sorted = rows.sortBy(_._2)
          val base = sorted.headOption.map(_._2).getOrElse(0L)
          println(f"\n===== $name wall=$wall%.3f s, ${sorted.size} jobs =====")
          sorted.foreach { case (id, t0, t1, d) =>
            println(f"  job $id%3d +${(t0 - base) / 1e3}%7.3f s  ${(t1 - t0) / 1e3}%7.3f s  $d")
          }
        case None => println(s"$name: NOT FOUND")
      }
    }
    spark.stop()
  }
}
