package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 15): phase timing of the compact roundtrip at
  * a given corpus — append×2, compact (whose internal cost is the
  * rewrite + footer verification), reopen count.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("graft_cprobe").toString
    val fam = graft.sources.TimeSeriesTable.fromEvents(
      graft.tables.Tables.events(spark, dir))
    val id = element_at(col("attributes"), "event_id").cast("long")
    t("append even")(graft.sources.TimeSeriesTable.append(
      fam.filter(pmod(id, lit(2)) === 0), root, "dom", "events"))
    t("append odd")(graft.sources.TimeSeriesTable.append(
      fam.filter(pmod(id, lit(2)) === 1), root, "dom", "events"))
    val (before, after) = t("compact")(
      graft.sources.TimeSeriesTable.compact(spark, root, "dom", "events"))
    println(s"[probe] files before=$before after=$after")
    t("reopen count")(graft.sources.TimeSeriesTable
      .open(spark, root, "dom", "events").count())
    spark.stop()
  }
}
// (footer-read microbench appended by round-15 session; see FooterProbe)
