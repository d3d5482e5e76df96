package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingOps

/** Streaming tier: each query REALLY runs through Structured Streaming
  * (file source -> stateful transform -> AvailableNow replay -> memory
  * sink) and returns the final materialized result, which the DuckDB
  * oracle checks against the equivalent batch SQL — streaming/batch
  * result parity is exactly the property worth pinning.
  */
object StreamingQueries {
  private type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "stream_window_agg" -> ((s, d) => StreamingOps.windowedAggReplay(s, d)),
    "stream_dedup_count" -> ((s, d) => StreamingOps.streamingDedupCounts(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "stream_window_agg" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS w_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin,

    "stream_dedup_count" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
