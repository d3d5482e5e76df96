package graft.examples

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Physical-plan audit: print `explain("formatted")` for the named
  * queries (or a default headline set) so shuffle counts, pushed
  * filters, pruned schemas, and broadcast choices can be reviewed.
  *
  * Usage: runMain graft.examples.PlanAudit <sfDir> [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "dd_minhash_lsh", "dd_ngram_jaccard", "ann_topk", "ann_lsh",
      "ts_asof_join", "ts_align_bucket", "q_join_agg", "dd_exact")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP(NANOS) parquet loads as raw longs instead of throwing
      // (session-level config, set beside the UTC pin; Tables loaders are
      // conf-write free — see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n================ $n ================")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"\n================ $n: NOT FOUND ================")
      }
    }
    spark.stop()
  }
}
