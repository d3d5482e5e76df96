package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read it as a long (legacy conf) and convert to a micros
    * TimestampType — the data is micro-precision, so this is lossless and
    * matches what DuckDB sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // set-if-needed: repeated calls must not keep rewriting shared
    // session conf (surprising in a shared session, and it invalidates
    // cached session state on some conf paths)
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(raw.columns.map(col).toIndexedSeq: _*)
  }
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
