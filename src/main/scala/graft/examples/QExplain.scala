package graft.examples

import org.apache.spark.sql.SparkSession

object QExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = sys.env.getOrElse("QEXPLAIN_QUERY", "q_quantile_sketch")
    val dir = sys.env.getOrElse("QEXPLAIN_DIR", "/root/testdata/sf0.01")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.show(50, false)
    if (sys.env.contains("QEXPLAIN_PLAN")) df.explain("formatted")
    spark.stop()
  }
}
