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

  /** `EXPLAIN [FORMATTED|EXTENDED|CODEGEN|COST|SIMPLE] <stmt>` — the
    * dialect face of Spark's explain modes (default FORMATTED): the
    * statement is compiled but not executed, and the result is a
    * one-row, one-column (`plan`) frame holding the plan text. Makes
    * plan regressions (lost pushdown, surprise shuffles) visible to any
    * harness that can run a query, not only to PlanShapeSpec.
    */
  private val explainRe =
    """(?is)^\s*explain(?:\s+(formatted|extended|codegen|cost|simple))?\s+((?:select|with)\b.*)$""".r

  /** `DESCRIBE domain.family` — series-catalog discovery over a family:
    * one row per series with point count, time extent (epoch micros —
    * the repo's engine-portable timestamp convention), and the sorted
    * attribute/tag key inventories (comma-joined — scalar output keeps
    * the row hash-comparable across engines). The reference holds this
    * in the m3 namespace/symtable metadata; here it is one scan-shaped
    * aggregation: count/extent in one pass, key inventories via
    * explode + collect_set (distinct KEYS only — never a collect of
    * values), joined on the series name. Row count = series
    * cardinality, so every aggregate output is metadata-sized at any
    * corpus scale.
    */
  private val describeRe = """(?is)^\s*describe\s+(\w+)\s*\.\s*(\w+)\s*$""".r

  private def describe(fam: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // ONE aggregation pass over the scan: key inventories via
    // collect_set of each row's key ARRAY (state is bounded by the
    // distinct key-SHAPES per series — typically a handful — never by
    // rows; collect_list of per-row arrays would be O(rows) state),
    // then flatten → distinct → sort post-aggregation. A null map
    // yields a null key array, which collect_set skips — same "" as
    // the old explode + left-join form.
    def keysOf(mapCol: String, out: String) =
      array_join(array_sort(array_distinct(flatten(
        collect_set(map_keys(col(mapCol)))))), ",").as(out)
    fam.groupBy("series").agg(
        count(lit(1)).as("n_points"),
        unix_micros(min(col("ts"))).as("first_us"),
        unix_micros(max(col("ts"))).as("last_us"),
        keysOf("attributes", "attr_keys"),
        keysOf("tags", "tag_keys"))
      .orderBy("series")
  }

  def sql(query: String, families: ((String, String)) => DataFrame): DataFrame =
    query match {
      case describeRe(dom, f) => describe(families((dom, f)))
      case explainRe(mode, rest) =>
        val df = Compiler.compile(Parser.parseStmt(rest), families)
        val m = Option(mode).map(_.toLowerCase).getOrElse("formatted")
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(m))
        val spark = df.sparkSession
        import spark.implicits._
        Seq(plan).toDF("plan")
      case _ => Compiler.compile(Parser.parseStmt(query), families)
    }

  /** The SQL front over a STREAM: compile a dialect query against
    * streaming family frames ([[TimeSeriesTable.openStream]]) — the
    * continuous-query face of the reference's north star. The supported
    * subset is the STATELESS tier: projection, scalar expressions, and
    * WHERE over a single series — exactly what runs incrementally with
    * no state store and no output-mode caveats; everything stateful
    * (aggregation, windows, multi-series alignment joins, ordering)
    * refuses at compile time with a pointer to the watermarked
    * StreamingOps tier, rather than failing at stream start.
    * Validation is two-layer: clause shapes on the AST, then a logical-
    * plan sweep (Join/Aggregate/Window/Sort) that also catches plans
    * reached indirectly — the multi-series exact-ts align, subquery
    * broadcasts.
    */
  def sqlStream(query: String,
      families: ((String, String)) => DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical
    val spec = Parser.parseStmt(query) match {
      case q: graft.boostql.Ast.QuerySpec => q
      case _ => throw Compiler.CompileException(
        "streaming queries do not support set operations")
    }
    def refuse(cond: Boolean, what: String): Unit =
      if (cond) throw Compiler.CompileException(
        s"streaming queries support stateless projection + WHERE only; " +
          s"$what is not supported (use the watermarked StreamingOps " +
          "tier for stateful streams)")
    refuse(spec.joins.nonEmpty, "JOIN")
    refuse(spec.groupBy.nonEmpty || spec.having.nonEmpty, "GROUP BY/HAVING")
    refuse(spec.orderBy.nonEmpty, "ORDER BY")
    refuse(spec.limit.isDefined, "LIMIT")
    refuse(spec.distinct, "DISTINCT")
    refuse(spec.qualify.isDefined, "QUALIFY")
    val df = Compiler.compile(spec, families)
    // the ANALYZED plan: window expressions only become logical.Window
    // nodes at analysis (pre-analysis they hide inside a Project).
    // WHITELIST sweep — only Project/Filter over leaf relations (plus
    // the aliasing wrappers analysis leaves in place) are stateless; a
    // blacklist would miss shapes reachable through derived tables
    // (inner DISTINCT → Deduplicate, inner LIMIT → GlobalLimit, inner
    // set ops → Except/Intersect, …), which would then fail at stream
    // start or silently grow unbounded state
    df.queryExecution.analyzed.foreach {
      case _: logical.Project | _: logical.Filter |
           _: logical.SubqueryAlias | _: logical.LeafNode => ()
      case j: logical.Join =>
        refuse(cond = true,
          s"multi-series alignment (a stream-stream ${j.nodeName})")
      case other => refuse(cond = true, s"the ${other.nodeName} operator")
    }
    df
  }

  /** Time-scoped execution — the dialect face of the reference's
    * `[windowStart, windowEnd)` execution window (executor.go:239-252,
    * an Executor parameter there, not SQL). Every family frame is
    * range-filtered before series resolution, so the bound reaches the
    * parquet scan (row-group stats + dt partition pruning when present).
    */
  def sql(query: String, families: ((String, String)) => DataFrame,
      windowStart: java.sql.Timestamp, windowEnd: java.sql.Timestamp): DataFrame =
    Compiler.compile(Parser.parseStmt(query), key =>
      graft.sources.TimeSeriesTable.timeRange(families(key), windowStart, windowEnd))

  /** Convenience resolver for the driver testdata: any `domain.family`
    * resolves to the events table adapted to the series-family shape
    * (FIXTURES.md §3).
    *
    * The adapted frame is persisted once per (session, dir) and reused
    * across queries: `fromEvents` derives the attribute map by parsing
    * the `props` JSON, and without the cache that `from_json` lands in
    * BOTH the Filter and the Project of every compiled query (Catalyst
    * inlines it through the projection) — one JSON parse per row per
    * occurrence. With the cache the map is materialized once and every
    * boost query reads it back. This is a test-adapter concern only:
    * the production path ([[TimeSeriesTable.open]]) stores `attributes`
    * as a real parquet map column and never parses JSON. The cache is
    * LRU-bounded at [[TestdataCacheMax]] entries (evicted frames
    * unpersist), so a long-lived host iterating many dirs cannot
    * accumulate persisted frames; [[evictTestdataCache]] drops eagerly.
    */
  def onTestdata(spark: SparkSession, sfDir: String)(query: String): DataFrame = {
    val fam = testdataCache.synchronized {
      Option(testdataCache.get((spark, sfDir))).getOrElse {
        val f = TimeSeriesTable.fromEvents(Tables.events(spark, sfDir))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        testdataCache.put((spark, sfDir), f)
        f
      }
    }
    sql(query, _ => fam)
  }

  /** How many (session, dir) family frames stay persisted at once; a
    * long-lived host iterating many dirs evicts (and unpersists) least-
    * recently-used entries past this instead of accumulating them. */
  private val TestdataCacheMax = 8

  private val testdataCache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
        16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        if (size > TestdataCacheMax) { e.getValue.unpersist(blocking = false); true }
        else false
    }

  /** Unpersist and drop cached testdata frames — for `spark` only, or
    * all sessions when omitted. The harness never needs this (one
    * session, two dirs); a long-lived host embedding the facade does.
    */
  def evictTestdataCache(spark: Option[SparkSession] = None): Unit =
    testdataCache.synchronized {
      import scala.jdk.CollectionConverters._
      val keys = testdataCache.keySet.asScala
        .filter(k => spark.forall(_ eq k._1)).toSeq
      keys.foreach { k =>
        Option(testdataCache.remove(k)).foreach(_.unpersist(blocking = false))
      }
    }
}
