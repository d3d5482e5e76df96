package graft.boostql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.TimeSeriesTable
import graft.tables.Tables

/** Public entry point for the BoostQL dialect: SQL string → DataFrame.
  *
  * The reference's full query lifecycle (SURVEY.md §3: parse → plan DAG →
  * pull-based executor) collapses to parse → compile → Catalyst here.
  * `families` plays the role of the m3 namespace lookup
  * (query/executor/executor.go:394-423): it maps `domain.family` to the
  * series-family DataFrame.
  */
object BoostQL {

  def sql(query: String, families: ((String, String)) => DataFrame): DataFrame =
    Compiler.compile(Parser.parse(query), families)

  /** Time-scoped execution — the dialect face of the reference's
    * `[windowStart, windowEnd)` execution window (executor.go:239-252,
    * an Executor parameter there, not SQL). Every family frame is
    * range-filtered before series resolution, so the bound reaches the
    * parquet scan (row-group stats + dt partition pruning when present).
    */
  def sql(query: String, families: ((String, String)) => DataFrame,
      windowStart: java.sql.Timestamp, windowEnd: java.sql.Timestamp): DataFrame =
    Compiler.compile(Parser.parse(query), key =>
      graft.sources.TimeSeriesTable.timeRange(families(key), windowStart, windowEnd))

  /** Convenience resolver for the driver testdata: any `domain.family`
    * resolves to the events table adapted to the series-family shape
    * (FIXTURES.md §3).
    */
  def onTestdata(spark: SparkSession, sfDir: String)(query: String): DataFrame =
    sql(query, _ => TimeSeriesTable.fromEvents(Tables.events(spark, sfDir)))
}
