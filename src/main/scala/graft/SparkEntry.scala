package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.boostql.BoostQL
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB twin in `oracleSql` unless the
  * operator is not SQL-expressible (then the driver records a rows-only
  * check). Column names are aliased identically on both sides, and every
  * oracled query is totally ordered on both sides so the dumped parquet
  * matches the oracle row-for-row.
  */
object SparkEntry {

  /** Flagship: the reference's own flagship query
    * (query/executor/executor_test.go:188 —
    * `SELECT cpu_utilization.host, cpu_utilization FROM d.f WHERE cpu_utilization < 100.0`)
    * through the BoostQL parser/compiler on the events family.
    */
  def entry(spark: SparkSession): DataFrame =
    BoostQL.onTestdata(spark, "/root/testdata/sf0.001")(
      "SELECT click.user, click FROM dom.events WHERE click < 100.0")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "boost_select_where" -> ((s, dir) =>
      BoostQL.onTestdata(s, dir)(
        "SELECT click.user, click FROM dom.events WHERE click < 100.0")
        .orderBy("click_user", "click")),

    "q1_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,8)"))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "boost_select_where" ->
      """SELECT CAST(user_id AS VARCHAR) AS click_user, value AS click
        |FROM events WHERE event_type = 'click' AND value < 100.0
        |ORDER BY click_user, click""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
