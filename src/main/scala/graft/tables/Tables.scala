package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType,
  TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` — filters and projections
  * applied downstream reach the scan via Catalyst pushdown, so these
  * helpers deliberately do NOT cache or materialize anything.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Normalize an events-shaped frame so `ts` is always a micros
    * `TimestampType`, whatever physical unit the parquet carried. The
    * testdata's `ts` unit has drifted across harness generations
    * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) without UTC adjustment), so
    * the contract is dispatched on the LOADED schema, not assumed:
    *
    *  - `LongType` — raw nanos (read under
    *    `spark.sql.legacy.parquet.nanosAsLong`, or a scale corpus that
    *    round-tripped the longs): truncate to micros. Lossless — the
    *    data is micro-precision.
    *  - `TimestampNTZType` — parquet micros with isAdjustedToUTC=false:
    *    reinterpret as an instant via the SESSION timezone. Lossless
    *    only under a UTC session (the harness contract; every
    *    entrypoint pins `spark.sql.session.timeZone=UTC`).
    *  - `TimestampType` — already an instant: passthrough.
    *
    * Column order is preserved. All loaders and streams that touch
    * `events` MUST route through here — six hand-copied `ts div 1000`
    * sites drifting independently is how round 9 lost 77 queries.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    val normalized = df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected nanos-long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
    normalized.select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** `events.ts` arrives in whatever unit the harness last generated
    * (see [[normalizeEventsTs]]). Loading a TIMESTAMP(NANOS) file
    * requires `spark.sql.legacy.parquet.nanosAsLong=true` in the
    * SESSION (set beside the UTC pin in every entrypoint builder —
    * session-level config is the entrypoint's job, so this loader
    * stays free of conf writes); on MICROS/adjusted files the conf is
    * inert.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` with the per-point attribute map decoded from the `props`
    * JSON string — the series-family row shape of SURVEY.md §1.4:
    * (series, ts, value, attributes map). `from_json` returns null map
    * for malformed rows; `element_at` on a missing key yields null,
    * matching the reference's nil cells (boostseriesiterator.go:407-463).
    */
  def eventsWithAttrs(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn(
      "attrs", from_json(col("props"), MapType(StringType, StringType)))
}
