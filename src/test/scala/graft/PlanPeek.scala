package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan of an ad-hoc
  * dialect query over the testdata families. The plan-audit loop's
  * tool (`Test/runMain graft.PlanPeek "SELECT …"`); regressions worth
  * keeping get promoted to PlanShapeSpec pins.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = graft.boostql.BoostQL.onTestdata(spark, sfDir)(args(0))
    df.explain("formatted")
    spark.stop()
  }
}
