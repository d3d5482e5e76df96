package graft.boostql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, element_at, lit, make_ym_interval, when}

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

  /** `SHOW FAMILIES [IN domain]` — the catalog-listing half of the
    * discovery face (DESCRIBE is the per-family half): one
    * (domain, family) row per registered family, sorted. Enumerable
    * only when the resolver IS an enumerable registry (the Map
    * overload); the function-resolver overloads refuse with a pointer
    * rather than listing nothing.
    */
  private val showRe =
    """(?is)^\s*show\s+families(?:\s+in\s+(\w+))?\s*$""".r

  /** `SHOW PARTITIONS domain.family` — the partition-inventory third of
    * the discovery face (SHOW FAMILIES lists the catalog, DESCRIBE one
    * family's series, this one family's PHYSICAL layout): one row per
    * dt= date partition with file count, bytes and footer row total.
    * Operates on the WAREHOUSE like the mutate verbs (takes the root,
    * not a query frame) and is metadata-only — the "what would
    * retention or a takedown touch" question, answerable on a petabyte
    * family without a scan. Compiles to [[TimeSeriesTable.partitions]].
    */
  private val showPartsRe =
    """(?is)^\s*show\s+partitions\s+(\w+)\s*\.\s*(\w+)\s*$""".r
  private val showPartsShapeRe = """(?is)^\s*show\s+partitions\b.*$""".r

  def sqlShowPartitions(stmt: String, spark: SparkSession,
      root: String): DataFrame = stmt match {
    case showPartsRe(dom, fam) =>
      TimeSeriesTable.partitions(spark, root, dom, fam)
    case _ => throw Compiler.CompileException(
      "SHOW PARTITIONS takes exactly 'SHOW PARTITIONS domain.family'")
  }

  /** Warehouse-aware `DESCRIBE domain.family` — the same six-column
    * series catalog as the frame-based route in [[sql]], but served
    * through [[TimeSeriesTable.describeCached]]'s signed per-partition
    * sidecar: a repeat DESCRIBE re-aggregates only partitions whose
    * file set moved (the SHOW PARTITIONS manifest discipline), so a
    * daily-ingest family answers from one partition's scan. Takes the
    * warehouse root like the mutate verbs; the frame route stays for
    * ad-hoc frames, and the two agree exactly (the merge is exact —
    * counts sum, extents min/max, key sets union).
    */
  def sqlDescribe(stmt: String, spark: SparkSession,
      root: String): DataFrame = stmt match {
    case describeRe(dom, fam) =>
      TimeSeriesTable.describeCached(spark, root, dom, fam)
    case _ => throw Compiler.CompileException(
      "DESCRIBE takes exactly 'DESCRIBE domain.family'")
  }

  /** `FUNNEL s1 -> s2 [-> …] BY <attr> [WITHIN '<interval>'] FROM
    * dom.family` — the ordered-conversion funnel as a first-class
    * statement (the most user-reached product-analytics shape): each
    * step is a SERIES of the family, users are identified by the named
    * per-point attribute (tag fallback, like `s.k` field access), and a
    * user advances to step i only via a step-i point strictly later
    * than their step-(i−1) first-reach; WITHIN bounds the whole journey
    * from the step-0 time. Compiles to
    * [[graft.operators.TimeSeriesOps.funnel]] (ONE hash exchange on the
    * user key); returns (step_index, step, users) ordered, users
    * non-increasing. Rows with no user attribute are skipped (no
    * journey without an identity).
    */
  private val funnelRe =
    """(?is)^\s*funnel\s+(.+?)\s+by\s+(\w+)(?:\s+within\s+'([^']+)')?\s+from\s+(\w+)\s*\.\s*(\w+)\s*$""".r

  /** `RETENTION BY <attr> [MAX <n> DAYS] FROM dom.family` — the day-N
    * retention triangle: users cohorted by first-seen day (any series
    * of the family counts as activity), counted on each later day they
    * returned, offsets 0..MAX (default 30). Compiles to
    * [[graft.operators.TimeSeriesOps.retentionCohorts]] (two shuffles —
    * user, then cohort×offset — the minimum for the semantics).
    * Returns (cohort_date, day_offset, users) ordered.
    */
  private val retentionRe =
    """(?is)^\s*retention\s+by\s+(\w+)(?:\s+max\s+(\d+)\s+days)?\s+from\s+(\w+)\s*\.\s*(\w+)\s*$""".r

  /** `OUTLIERS <series> [K <k>] FROM dom.family` — robust MAD anomaly
    * detection over one series: points with |v − median| > k·MAD
    * (default k = 3), the dispersion measure outliers cannot drag.
    * Compiles to [[graft.operators.TimeSeriesOps.madOutliersAgg]] — the
    * hot-key-safe aggregate/broadcast form (medians partial-aggregate;
    * data rows never shuffle). Returns (ts_us, value, dev, mad),
    * unordered (order at the consumer).
    */
  private val outliersRe =
    """(?is)^\s*outliers\s+(\w+)(?:\s+k\s+([0-9.]+))?\s+from\s+(\w+)\s*\.\s*(\w+)\s*$""".r

  /** User identity for FUNNEL/RETENTION: the named per-point attribute,
    * tag fallback — the same resolution as `series.k` field access. */
  private def userKey(attr: String): Column = {
    import org.apache.spark.sql.functions._
    coalesce(element_at(col("attributes"), attr),
      element_at(col("tags"), attr))
  }

  private def funnelStmt(stepsTxt: String, attr: String, within: String,
      fam: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val steps = stepsTxt.split("->").map(_.trim).toSeq
    if (steps.isEmpty || steps.exists(!_.matches("\\w+")))
      throw Compiler.CompileException(
        "FUNNEL steps must be series names separated by '->'")
    if (steps.distinct.size != steps.size)
      throw Compiler.CompileException("FUNNEL steps must be distinct")
    val withinUs = Option(within).map(iv =>
      Compiler.parseIntervalMicros(iv).getOrElse(
        throw Compiler.CompileException(
          s"malformed FUNNEL WITHIN interval '$iv' — expected '<n> " +
            "<microsecond|millisecond|second|minute|hour|day>[s]'")))
    val df = fam.select(col("series"), userKey(attr).as("__u"), col("ts"))
      .filter(col("__u").isNotNull)
    graft.operators.TimeSeriesOps.funnel(
      df, "__u", "series", "ts", steps, withinUs)
  }

  private def retentionStmt(attr: String, maxDays: String,
      fam: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = fam.select(userKey(attr).as("__u"), col("ts"))
      .filter(col("__u").isNotNull)
    graft.operators.TimeSeriesOps.retentionCohorts(
      df, "__u", "ts", Option(maxDays).map(parseNum(_, "RETENTION MAX",
        _.toInt)).getOrElse(30))
  }

  /** Numeric statement captures ('OUTLIERS … K 3', 'RETENTION … MAX
    * 30') parse through here so a malformed literal ('3..5', a
    * >19-digit MAX) raises the dialect's CompileException naming the
    * literal — like every other malformed-statement path — instead of
    * leaking a raw NumberFormatException. */
  private def parseNum[T](raw: String, what: String, f: String => T): T = {
    val v = try f(raw) catch {
      case _: NumberFormatException => throw Compiler.CompileException(
        s"malformed $what literal '$raw'")
    }
    // String.toDouble accepts 'NaN'/'Infinity', which would slide past
    // downstream positivity checks (NaN comparisons are all false) and
    // silently return empty results — refuse them as malformed too
    v match {
      case d: Double if !java.lang.Double.isFinite(d) =>
        throw Compiler.CompileException(s"malformed $what literal '$raw'")
      case _ => v
    }
  }

  private def outliersStmt(series: String, k: String,
      fam: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val kk = Option(k).map(parseNum(_, "OUTLIERS K", _.toDouble))
      .getOrElse(3.0)
    if (kk <= 0.0) throw Compiler.CompileException(
      "OUTLIERS K must be positive")
    val rows = fam.filter(col("series") === series)
      .select(col("series"), unix_micros(col("ts")).as("ts_us"), col("value"))
    graft.operators.TimeSeriesOps
      .madOutliersAgg(rows, Seq("series"), "value", kk)
      .select(col("ts_us"), col("value"), col("dev"), col("mad"))
  }

  /** SQL over an ENUMERABLE family registry: everything the resolver
    * overload runs, plus `SHOW FAMILIES [IN domain]` over the map's
    * keys. */
  def sql(query: String,
      families: Map[(String, String), DataFrame]): DataFrame =
    query match {
      case showRe(dom) =>
        val spark = families.headOption.map(_._2.sparkSession).getOrElse(
          throw Compiler.CompileException(
            "SHOW FAMILIES: the registry is empty"))
        import spark.implicits._
        families.keys.toSeq
          .filter(k => Option(dom).forall(_.equalsIgnoreCase(k._1)))
          .sorted.toDF("domain", "family")
      case _ => sql(query, families.apply _)
    }

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

  /** `INSERT INTO domain.family <select>` — the write half of the
    * north star ("ingest/query via Spark"): the dialect's SQL ingest
    * face, compiling to [[TimeSeriesTable.append]] (date-partitioned
    * parquet, rows sorted by (series, ts) within partitions — the
    * 100 TB layout). The reference is read-only at its SQL layer
    * (boostsession.go:94-184 writes through the API only), so this is
    * extension surface.
    *
    * Shape contract — the select's OUTPUT maps onto the family's
    * long-format rows by UNPIVOT: it must carry the time axis as a
    * timestamp column named `ts`, every NUMERIC column becomes one
    * series (named by the column, so alias the items) with the
    * column's value as the datapoint value, and every STRING column is
    * a DIMENSION — it lands as a per-point attribute named by the
    * column on each series row (the grouped-rollup shape: `SELECT
    * bucket(ts, '1 day') AS ts, click.user AS u, count(*) AS n …
    * GROUP BY ts, u` materializes per-user rollups queryable as
    * `n.u`). NULL cells are the absence of a datapoint and are not
    * written. Columns that collide with the family layout (`series`,
    * `value`, `tags`, `attributes`, `dt`), non-numeric non-string
    * columns, duplicate names, a series-less select and a ts-less
    * select all refuse at compile time.
    */
  private val insertRe =
    """(?is)^\s*insert\s+into\s+(\w+)\s*\.\s*(\w+)\s+((?:select|with)\b.*)$""".r

  def sqlInsert(stmt: String, families: ((String, String)) => DataFrame,
      root: String): Unit = stmt match {
    case insertRe(dom, fam, rest) =>
      val df = Compiler.compile(Parser.parseStmt(rest), families)
      TimeSeriesTable.append(insertLong(df), root, dom, fam)
    case _ => throw Compiler.CompileException(
      "INSERT must be 'INSERT INTO domain.family SELECT …'")
  }

  /** `UPSERT INTO domain.family <select>` — idempotent SQL ingest, the
    * merge sibling of [[sqlInsert]]: the select maps onto long rows by
    * the same UNPIVOT contract ([[insertLong]]), but rows REPLACE any
    * existing datapoint with the same (series, ts) key instead of
    * duplicating it, compiling to [[TimeSeriesTable.upsertRows]]
    * (copy-on-write rewrite of only the partitions holding colliding
    * keys; everything else is an additive append). This is the
    * re-delivery/correction verb: `INSERT` run twice doubles a day,
    * `UPSERT` run twice is the same day. Returns (existing rows
    * replaced, incoming rows written).
    */
  private val upsertRe =
    """(?is)^\s*upsert\s+into\s+(\w+)\s*\.\s*(\w+)\s+((?:select|with)\b.*)$""".r

  def sqlUpsert(stmt: String, families: ((String, String)) => DataFrame,
      root: String): (Long, Long) = stmt match {
    case upsertRe(dom, fam, rest) =>
      val df = Compiler.compile(Parser.parseStmt(rest), families)
      val (replaced, written, _) = TimeSeriesTable.upsertRows(
        df.sparkSession, root, dom, fam, insertLong(df))
      (replaced, written)
    case _ => throw Compiler.CompileException(
      "UPSERT must be 'UPSERT INTO domain.family SELECT …'")
  }

  /** `CREATE [OR REPLACE] FAMILY domain.family AS <select>` — CTAS, the
    * DDL face of the derived-family workflow [[sqlInsert]] serves
    * imperatively: one statement materializes a query as a NEW family
    * in the warehouse (select output → long rows by the same UNPIVOT
    * contract, date-partitioned [[TimeSeriesTable.append]] layout).
    * Plain CREATE refuses when the family already exists (ANSI; an
    * accidental re-run must not double a corpus — that is INSERT's
    * contract, chosen explicitly); OR REPLACE stages the new rows
    * FIRST, then swaps — a failed select never destroys the previous
    * family. Returns the number of datapoints written.
    */
  def sqlCreateFamily(stmt: String,
      families: ((String, String)) => DataFrame, root: String): Long = {
    val createRe =
      """(?is)^\s*create\s+(or\s+replace\s+)?family\s+(\w+)\s*\.\s*(\w+)\s+as\s+((?:select|with)\b.*)$""".r
    stmt match {
      case createRe(orReplace, dom, fam, rest) =>
        val df = Compiler.compile(Parser.parseStmt(rest), families)
        val spark = df.sparkSession
        val dir = new org.apache.hadoop.fs.Path(s"$root/$dom/$fam")
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val exists = fs.exists(dir)
        if (exists && orReplace == null) throw Compiler.CompileException(
          s"family $dom.$fam already exists — CREATE OR REPLACE FAMILY " +
            "swaps it atomically, INSERT INTO appends to it")
        val rows = insertLong(df)
        if (!exists) {
          TimeSeriesTable.append(rows, root, dom, fam)
          TimeSeriesTable.open(spark, root, dom, fam).count()
        } else {
          // replace: stage the full new family, then two-rename swap
          // (the compact() shape) — the select runs BEFORE anything
          // moves, so a failure leaves the old family untouched
          val tmp = new org.apache.hadoop.fs.Path(
            s"$root/$dom/.${fam}__ctas")
          if (fs.exists(tmp)) fs.delete(tmp, true)
          TimeSeriesTable.append(rows, root, dom, s".${fam}__ctas")
          val aside = new org.apache.hadoop.fs.Path(
            s"$root/$dom/.${fam}__ctas_old")
          if (fs.exists(aside)) fs.delete(aside, true)
          if (!fs.rename(dir, aside)) throw new java.io.IOException(
            s"CREATE OR REPLACE FAMILY: could not move $dir aside — " +
              "family left untouched")
          if (!fs.rename(tmp, dir)) {
            fs.rename(aside, dir)
            throw new java.io.IOException(
              s"CREATE OR REPLACE FAMILY: swap rename failed — " +
                "family restored")
          }
          fs.delete(aside, true)
          // count from the LIVE path post-swap: the dot-prefixed
          // staging dir is invisible to Spark's hidden-path filter
          TimeSeriesTable.open(spark, root, dom, fam).count()
        }
      case _ => throw Compiler.CompileException(
        "CREATE FAMILY takes 'CREATE [OR REPLACE] FAMILY domain.family " +
          "AS SELECT …'")
    }
  }

  /** `DROP FAMILY [IF EXISTS] domain.family` — the operational drop the
    * row-level verbs refuse by design (a whole-family DELETE is not a
    * query). Removes the family directory recursively. Plain DROP of a
    * missing family refuses (a typo should not silently succeed);
    * IF EXISTS makes it idempotent. Returns true when a family was
    * dropped.
    */
  def sqlDropFamily(stmt: String, spark: SparkSession,
      root: String): Boolean = {
    val dropRe =
      """(?is)^\s*drop\s+family\s+(if\s+exists\s+)?(\w+)\s*\.\s*(\w+)\s*$""".r
    stmt match {
      case dropRe(ifExists, dom, fam) =>
        val dir = new org.apache.hadoop.fs.Path(s"$root/$dom/$fam")
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(dir)) {
          if (ifExists == null) throw Compiler.CompileException(
            s"family $dom.$fam does not exist — DROP FAMILY IF EXISTS " +
              "is the idempotent form")
          false
        } else {
          if (!fs.delete(dir, true)) throw new java.io.IOException(
            s"DROP FAMILY: could not delete $dir")
          true
        }
      case _ => throw Compiler.CompileException(
        "DROP FAMILY takes 'DROP FAMILY [IF EXISTS] domain.family'")
    }
  }

  /** `MERGE INTO domain.family USING (<select>) WHEN …` — ANSI MERGE,
    * the general mutate verb the tier's other verbs are special cases
    * of (UPSERT ≡ unconditional matched-UPDATE + not-matched-INSERT).
    * The USING select maps onto long rows by the same UNPIVOT contract
    * as INSERT/UPSERT ([[insertLong]]) and matches existing rows on
    * the family key (series, ts); the WHEN clauses then decide each
    * row's fate:
    *
    *   - `WHEN MATCHED [AND <cond>] THEN UPDATE` — replace the
    *     existing row with the source row
    *   - `WHEN MATCHED [AND <cond>] THEN DELETE` — drop it
    *   - `WHEN NOT MATCHED THEN INSERT` — write unmatched source rows
    *   - `WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE` — the
    *     MIRROR-SYNC clause: drop target rows whose key is absent from
    *     the batch (conditions see target columns only; `src.` refuses
    *     — there is no source row by definition).
    *   - `WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET
    *     <target> = <expr>[, …]` — the ANSI "flag stale rows instead
    *     of purging them" half: absent-key rows take the SET
    *     assignments ([[sqlUpdate]]'s target grammar — a series' value
    *     or a `series.attribute`; a NULL rhs removes the key), with
    *     both conditions AND set expressions over TARGET columns only
    *     (`src.` refuses in either position). Scale note:
    *     the by-source clauses invert locality — absent keys can sit
    *     on ANY date, so the classification reads the WHOLE family
    *     (inherent to mirror-sync); keep-only dates still stay
    *     byte-identical, and a by-source UPDATE touching only series S
    *     rewrites only dates holding an absent-key S row.
    *
    * Matched clauses apply FIRST-TRUE-WINS in statement order (ANSI);
    * a row matching no clause is kept unchanged. Conditions ride the
    * mutate verbs' row-level grammar (series-scoped terms, ts/series,
    * scalar builtins, CASE) extended with the reserved `src` prefix
    * for the incoming side — `src.value` is the source datapoint,
    * `src.<k>` a source attribute — so `WHEN MATCHED AND p < src.value
    * THEN UPDATE` is the only-newer-wins shape and `WHEN MATCHED AND
    * src.status = 'tombstone' THEN DELETE` a fed takedown. Compiles to
    * [[TimeSeriesTable.mergeRows]]: copy-on-write rewrite of only the
    * dates holding a non-keep outcome, footer-verified, two-rename
    * swap; insert-only dates stay on the additive append. Returns
    * (rows updated, rows deleted, rows inserted).
    */
  def sqlMerge(stmt: String, families: ((String, String)) => DataFrame,
      root: String): (Long, Long, Long) = {
    val headRe =
      """(?is)^\s*merge\s+into\s+(\w+)\s*\.\s*(\w+)\s+using\s*\(""".r
    val m = headRe.findPrefixMatchOf(stmt).getOrElse(
      throw Compiler.CompileException(
        "MERGE takes 'MERGE INTO domain.family USING (<select>) " +
          "WHEN MATCHED [AND <cond>] THEN UPDATE|DELETE … " +
          "[WHEN NOT MATCHED THEN INSERT]'"))
    val (dom, fam) = (m.group(1), m.group(2))
    // scan to the USING paren's top-level close (quotes respected)
    val openIdx = m.end - 1
    var depth = 0; var inStr = false; var closeIdx = -1
    var i = openIdx
    while (i < stmt.length && closeIdx < 0) {
      val c = stmt.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) closeIdx = i }
      i += 1
    }
    if (closeIdx < 0) throw Compiler.CompileException(
      "MERGE USING (<select>) is missing its closing parenthesis")
    val select = stmt.substring(openIdx + 1, closeIdx)
    val rest = stmt.substring(closeIdx + 1)
      .replaceFirst("(?is)^\\s*(?:as\\s+src\\b)?\\s*", "")
    // split the tail at top-level WHEN keywords introducing a clause
    // (CASE WHEN inside a condition sits behind MATCHED/NOT, and
    // quoted/parenthesized text is skipped by the scan)
    val whenAt = scala.collection.mutable.ArrayBuffer.empty[Int]
    depth = 0; inStr = false; i = 0
    val lower = rest.toLowerCase
    while (i < rest.length) {
      val c = rest.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && lower.startsWith("when", i) &&
          (i == 0 || !Character.isLetterOrDigit(rest.charAt(i - 1))) &&
          lower.substring(i + 4).dropWhile(_.isWhitespace)
            .matches("(?s)^(matched|not\\s+matched)\\b.*"))
        whenAt += i
      i += 1
    }
    if (whenAt.isEmpty || rest.substring(0, whenAt.head).trim.nonEmpty)
      throw Compiler.CompileException(
        "MERGE needs at least one WHEN clause after USING (<select>)")
    val clauseTexts = whenAt.toSeq.zipAll(
      whenAt.toSeq.drop(1), -1, rest.length)
      .map { case (a, b) => rest.substring(a, b) }
    val matchedRe =
      """(?is)^when\s+matched\s+(?:and\s+(.*)\s+)?then\s+(update|delete)\s*$""".r
    val insertRe2 = """(?is)^when\s+not\s+matched\s+then\s+insert\s*$""".r
    // WHEN NOT MATCHED BY SOURCE — the MIRROR-SYNC clauses: target
    // rows whose key is absent from the batch. DELETE drops them;
    // UPDATE SET applies target-side assignments (the dialect's
    // matched-UPDATE replaces the row with the SOURCE row, which does
    // not exist here — so the by-source form carries explicit SET
    // text instead). Conditions AND set expressions see TARGET columns
    // only — `src.` refuses with the reason instead of silently
    // resolving as a series named src.
    val bySrcUpdRe =
      """(?is)^when\s+not\s+matched\s+by\s+source\s+(?:and\s+(.*)\s+)?then\s+update\s+set\s+(.*\S)\s*$""".r
    val bySrcRe =
      """(?is)^when\s+not\s+matched\s+by\s+source\s+(?:and\s+(.*)\s+)?then\s+(update|delete|insert)\s*$""".r
    def parseCond(condText: String, what: String, allowSrc: Boolean,
        forbidSrc: Boolean): Column = {
      val parsed = Parser.parseStmt(
        s"SELECT 1 AS one FROM $dom.$fam WHERE $condText") match {
        case q: Ast.QuerySpec => q
        case _ => throw Compiler.CompileException(
          s"a MERGE $what condition must be a plain predicate")
      }
      val pred = parsed.where.getOrElse(
        throw Compiler.CompileException(
          s"a MERGE $what condition must be a plain predicate"))
      longPredicate(pred, "MERGE", allowSrc = allowSrc,
        forbidSrc = forbidSrc)
    }
    var insertClauses = 0
    var sawUnconditional = false
    var sawUnconditionalBs = false
    val matchedB = Seq.newBuilder[(Option[Column], String)]
    val bySourceB = Seq.newBuilder[TimeSeriesTable.BySourceClause]
    def bsCond(condText: String): Option[Column] = {
      if (sawUnconditionalBs) throw Compiler.CompileException(
        "a WHEN NOT MATCHED BY SOURCE clause after an unconditional " +
          "one is unreachable — first true clause wins; reorder or " +
          "add AND")
      val cond = Option(condText).map(parseCond(_, "by-source",
        allowSrc = false, forbidSrc = true))
      if (cond.isEmpty) sawUnconditionalBs = true
      cond
    }
    clauseTexts.foreach {
      case bySrcUpdRe(condText, setText) =>
        bySourceB += TimeSeriesTable.BySourceClause(bsCond(condText),
          "update", parseBySourceAssigns(dom, fam, setText))
      case bySrcRe(condText, action) =>
        action.toLowerCase match {
          case "delete" => ()
          case "update" => throw Compiler.CompileException(
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE needs SET " +
              "assignments — there is no source row to replace with " +
              "for an absent key; spell the target-side rewrite as " +
              "UPDATE SET <target> = <expr>[, …]")
          case _ => throw Compiler.CompileException(
            "WHEN NOT MATCHED BY SOURCE THEN INSERT is contradictory — " +
              "the clause addresses rows already present in the target")
        }
        bySourceB += TimeSeriesTable.BySourceClause(bsCond(condText),
          "delete")
      case insertRe2() =>
        insertClauses += 1
        if (insertClauses > 1) throw Compiler.CompileException(
          "MERGE allows one WHEN NOT MATCHED THEN INSERT clause")
      case matchedRe(condText, action) =>
        if (sawUnconditional) throw Compiler.CompileException(
          "a WHEN MATCHED clause after an unconditional one is " +
            "unreachable — first true clause wins; reorder or add AND")
        val cond = Option(condText).map(parseCond(_, "matched",
          allowSrc = true, forbidSrc = false))
        if (cond.isEmpty) sawUnconditional = true
        matchedB += ((cond, action.toLowerCase))
      case other => throw Compiler.CompileException(
        s"malformed MERGE clause '${other.trim.take(60)}' — expected " +
          "WHEN MATCHED [AND <cond>] THEN UPDATE|DELETE, " +
          "WHEN NOT MATCHED THEN INSERT or " +
          "WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE | " +
          "UPDATE SET <target> = <expr>[, …]")
    }
    val df = Compiler.compile(Parser.parseStmt(select), families)
    val (upd, del, ins, _) = TimeSeriesTable.mergeRows(
      df.sparkSession, root, dom, fam, insertLong(df),
      matchedB.result(), insertClauses > 0, bySourceB.result())
    (upd, del, ins)
  }

  /** SET-assignment parse for the MERGE by-source UPDATE clause —
    * [[sqlUpdate]]'s target grammar (a 1-part name sets that series'
    * value, `series.attr` a per-point attribute, NULL rhs removes the
    * key; `ts`/`series` refuse) with the by-source restriction: RHS
    * expressions see TARGET columns only (`src.` refuses — there is no
    * source row for an absent key by definition).
    */
  private def parseBySourceAssigns(dom: String, fam: String,
      setText: String): Seq[(String, Option[String], Column)] = {
    val rawAssigns = splitTopLevel(setText, ',').map { piece =>
      val eq = topLevelIndexOf(piece, '=')
      if (eq < 0) throw Compiler.CompileException(
        s"malformed SET assignment '${piece.trim}' — expected " +
          "<target> = <expression>")
      (piece.substring(0, eq), piece.substring(eq + 1))
    }
    val targetRe = """(?s)^\s*(\w+)(?:\s*\.\s*(\w+))?\s*$""".r
    val targets: Seq[(String, Option[String])] = rawAssigns.map(_._1).map {
      case targetRe(a, b) => (a, Option(b))
      case other => throw Compiler.CompileException(
        s"MERGE by-source SET target '${other.trim}' must be a series " +
          "name (sets its value) or series.attribute")
    }
    targets.foreach { case (s, a) =>
      if (a.isEmpty && (s.equalsIgnoreCase("ts") ||
          s.equalsIgnoreCase("series")))
        throw Compiler.CompileException(
          s"MERGE by-source SET cannot assign '$s' — moving rows along " +
            "the time axis or renaming a series is a DELETE plus an " +
            "INSERT")
    }
    val dup = targets.diff(targets.distinct)
    if (dup.nonEmpty) throw Compiler.CompileException(
      s"duplicate MERGE by-source SET target ${dup.map { case (s, a) =>
        a.fold(s)(s + "." + _) }.distinct.mkString(", ")}")
    val synthetic = rawAssigns.map(_._2).zipWithIndex
      .map { case (rhs, i) => s"($rhs) AS __set$i" }.mkString(", ")
    val parsed = Parser.parseStmt(
      s"SELECT $synthetic FROM $dom.$fam") match {
      case q: Ast.QuerySpec => q
      case _ => throw Compiler.CompileException(
        "MERGE by-source SET expressions must be plain row-level " +
          "expressions")
    }
    targets.zip(parsed.select).map { case ((s, a), item) =>
      val op = item match {
        case Ast.ExprItem(o, _) => o
        case Ast.FieldItem(n) => Ast.ORef(n)
        case _: Ast.AggItem => throw Compiler.CompileException(
          "MERGE by-source SET expressions are row-level — aggregates " +
            "have no meaning over one row; compute the aggregate first " +
            "and spell it as a literal")
      }
      val (rhsCol, refs) = longOperand(op, "MERGE by-source SET",
        allowSrc = false, forbidSrc = true)
      val foreign = refs - s
      if (foreign.nonEmpty) throw Compiler.CompileException(
        s"the SET expression for '${a.fold(s)(s + "." + _)}' " +
          s"references series ${foreign.toSeq.sorted.mkString(", ")} — " +
          s"the assignment applies to rows of series '$s', and one " +
          "long row holds one series")
      (s, a, rhsCol)
    }
  }

  /** `DELETE FROM domain.family WHERE ts < DATE 'YYYY-MM-DD'` — the
    * SQL face of retention (TimescaleDB `drop_chunks`), compiling to
    * [[TimeSeriesTable.expire]]: METADATA-ONLY whole-date-partition
    * drops, never a rewrite — the only DELETE shape that works on a
    * petabyte family, and therefore the only shape this face accepts.
    * The bound is exclusive and PARTITION-GRANULAR: rows strictly
    * before the date go, the date itself and everything after stay.
    * Any other predicate (a mid-day timestamp bound, a value filter, a
    * series filter) refuses with the reason — a row-level DELETE would
    * silently become a full-family rewrite, which a user must opt into
    * by writing the rewrite themselves. Returns the dropped partition
    * names (empty when nothing is old enough).
    */
  private val deleteRe =
    """(?is)^\s*delete\s+from\s+(\w+)\s*\.\s*(\w+)\s+where\s+ts\s*<\s*date\s*'(\d{4}-\d{2}-\d{2})'\s*$""".r
  private val deleteWhereRe =
    """(?is)^\s*delete\s+from\s+(\w+)\s*\.\s*(\w+)\s+where\s+(.*\S)\s*$""".r
  private val deleteShapeRe = """(?is)^\s*delete\b.*$""".r

  def sqlDelete(stmt: String, spark: SparkSession, root: String): Seq[String] =
    stmt match {
      case deleteRe(dom, fam, cutoff) =>
        TimeSeriesTable.expire(spark, root, dom, fam,
          java.sql.Date.valueOf(cutoff))
      case deleteWhereRe(dom, fam, predText) =>
        // ROW-LEVEL DELETE (the takedown path): any other WHERE compiles
        // to [[TimeSeriesTable.deleteRows]]'s copy-on-write rewrite of
        // only the affected date partitions. The predicate parses
        // through the ordinary grammar (wrapped in a synthetic SELECT so
        // the full expression surface — IN, BETWEEN, LIKE, IS NULL,
        // arithmetic, intervals — comes for free) and compiles against
        // the family's LONG rows via [[deletePredicate]].
        val parsed = Parser.parseStmt(
          s"SELECT ts FROM $dom.$fam WHERE $predText") match {
          case q: Ast.QuerySpec => q
          case _ => throw Compiler.CompileException(
            "DELETE WHERE must be a plain predicate")
        }
        // the synthetic SELECT would happily absorb trailing clauses
        // (GROUP BY / ORDER BY / LIMIT …) into the spec — refuse them
        if (parsed.joins.nonEmpty || parsed.groupBy.nonEmpty ||
            parsed.having.isDefined || parsed.orderBy.nonEmpty ||
            parsed.limit.isDefined || parsed.offset.isDefined ||
            parsed.qualify.isDefined || parsed.fill.isDefined)
          throw Compiler.CompileException(
            "DELETE takes exactly 'DELETE FROM domain.family WHERE " +
              "<predicate>' — no joins, grouping, ordering or paging")
        val pred = parsed.where.getOrElse(throw Compiler.CompileException(
          "DELETE needs a WHERE predicate"))
        TimeSeriesTable.deleteRows(spark, root, dom, fam,
          deletePredicate(pred))._2
      case deleteShapeRe() => throw Compiler.CompileException(
        "DELETE FROM domain.family needs a WHERE predicate — deleting a " +
          "whole family is an operational drop, not a query; use " +
          "retention (\"WHERE ts < DATE 'YYYY-MM-DD'\", metadata-only " +
          "partition drops) or a row predicate (copy-on-write rewrite " +
          "of the affected date partitions)")
      case _ => throw Compiler.CompileException(
        "sqlDelete expects a DELETE statement")
    }

  /** `UPDATE domain.family SET <target> = <expr> [, …] WHERE <predicate>`
    * — row-level UPDATE, the redaction verb pairing [[sqlDelete]]'s
    * takedown path (PII masking, value corrections, attribute
    * backfills) and the reference write tier's other missing mutate
    * verb (boostsession.go:94-184 appends; it never rewrites).
    * Compiles to [[TimeSeriesTable.updateRows]]: a copy-on-write
    * rewrite of ONLY the date partitions holding touched rows.
    *
    * Targets address the long layout like DELETE predicates do: a
    * 1-part name sets that series' VALUE (rhs cast to double), a
    * 2-part `series.attr` sets that series' per-point attribute (rhs
    * cast to string; a NULL rhs REMOVES the key — redaction by
    * deletion). `ts` and `series` are not assignable — moving rows
    * along the partition axis or renaming a series is a DELETE plus an
    * INSERT. RHS expressions ride the ordinary grammar (arithmetic,
    * CAST, CASE, intervals, scalar builtins) over the SAME series'
    * row; all SET expressions evaluate against pre-update state (ANSI).
    * A row is touched when the WHERE is TRUE on it (row-level reading,
    * same as DELETE) and its series has an assignment. Returns the
    * affected partition names.
    */
  private val updateRe =
    """(?is)^\s*update\s+(\w+)\s*\.\s*(\w+)\s+set\s+(.*\S)\s+where\s+(.*\S)\s*$""".r
  private val updateShapeRe = """(?is)^\s*update\b.*$""".r

  def sqlUpdate(stmt: String, spark: SparkSession, root: String): Seq[String] =
    stmt match {
      case updateRe(dom, fam, setText, predText) =>
        val rawAssigns = splitTopLevel(setText, ',').map { piece =>
          val eq = topLevelIndexOf(piece, '=')
          if (eq < 0) throw Compiler.CompileException(
            s"malformed SET assignment '${piece.trim}' — expected " +
              "<target> = <expression>")
          (piece.substring(0, eq), piece.substring(eq + 1))
        }
        val targetRe = """(?s)^\s*(\w+)(?:\s*\.\s*(\w+))?\s*$""".r
        val targets: Seq[(String, Option[String])] = rawAssigns.map(_._1).map {
          case targetRe(a, b) => (a, Option(b))
          case other => throw Compiler.CompileException(
            s"UPDATE target '${other.trim}' must be a series name " +
              "(sets its value) or series.attribute")
        }
        targets.foreach { case (s, a) =>
          if (a.isEmpty && (s.equalsIgnoreCase("ts") ||
              s.equalsIgnoreCase("series")))
            throw Compiler.CompileException(
              s"UPDATE cannot assign '$s' — moving rows along the time " +
                "axis or renaming a series changes which partition and " +
                "row group a row lives in; spell it as a DELETE plus an " +
                "INSERT")
        }
        val dup = targets.diff(targets.distinct)
        if (dup.nonEmpty) throw Compiler.CompileException(
          s"duplicate UPDATE target ${dup.map { case (s, a) =>
            a.fold(s)(s + "." + _) }.distinct.mkString(", ")}")
        // the RHS expressions and the WHERE ride the ordinary grammar
        // via one synthetic SELECT (the parens keep item boundaries)
        val synthetic = rawAssigns.map(_._2).zipWithIndex
          .map { case (rhs, i) => s"($rhs) AS __set$i" }.mkString(", ")
        val parsed = Parser.parseStmt(
          s"SELECT $synthetic FROM $dom.$fam WHERE $predText") match {
          case q: Ast.QuerySpec => q
          case _ => throw Compiler.CompileException(
            "UPDATE WHERE must be a plain predicate")
        }
        if (parsed.joins.nonEmpty || parsed.groupBy.nonEmpty ||
            parsed.having.isDefined || parsed.orderBy.nonEmpty ||
            parsed.limit.isDefined || parsed.offset.isDefined ||
            parsed.qualify.isDefined || parsed.fill.isDefined)
          throw Compiler.CompileException(
            "UPDATE takes exactly 'UPDATE domain.family SET <target> = " +
              "<expr>[, …] WHERE <predicate>' — no joins, grouping, " +
              "ordering or paging")
        val pred = parsed.where.getOrElse(throw Compiler.CompileException(
          "UPDATE needs a WHERE predicate — rewriting a whole family " +
            "unconditionally is a backfill job, not a query"))
        val assigns = targets.zip(parsed.select).map {
          case ((s, a), item) =>
            val op = item match {
              case Ast.ExprItem(o, _) => o
              case Ast.FieldItem(n) => Ast.ORef(n)
              case _: Ast.AggItem => throw Compiler.CompileException(
                "UPDATE SET expressions are row-level — aggregates have " +
                  "no meaning over one row; compute the aggregate first " +
                  "and spell it as a literal")
            }
            val (rhsCol, refs) = longOperand(op, "UPDATE")
            val foreign = refs - s
            if (foreign.nonEmpty) throw Compiler.CompileException(
              s"the SET expression for '${a.fold(s)(s + "." + _)}' " +
                s"references series ${foreign.toSeq.sorted.mkString(", ")} " +
                s"— the assignment applies to rows of series '$s', and " +
                "one long row holds one series")
            (s, a, rhsCol)
        }
        TimeSeriesTable.updateRows(spark, root, dom, fam,
          longPredicate(pred, "UPDATE"), assigns)._2
      case updateShapeRe() => throw Compiler.CompileException(
        "UPDATE takes exactly 'UPDATE domain.family SET <target> = " +
          "<expr>[, …] WHERE <predicate>'")
      case _ => throw Compiler.CompileException(
        "sqlUpdate expects an UPDATE statement")
    }

  /** Split at top-level occurrences of `sep` — outside parens and
    * single-quoted literals (doubled-quote escapes round-trip: the
    * closing quote ends the literal, the next reopens it).
    */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { cur += c; if (c == '\'') inStr = false }
      else if (c == '\'') { inStr = true; cur += c }
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** First top-level index of `ch` (outside parens and quoted
    * literals), or -1.
    */
  private def topLevelIndexOf(s: String, ch: Char): Int = {
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else if (c == '\'') inStr = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ch && depth == 0) return i
      i += 1
    }
    -1
  }

  /** Compile a DELETE WHERE tree to a Column over the family's LONG
    * rows (series, ts, value, tags, attributes). DELETE is row-level
    * over the PHYSICAL layout, unlike SELECT's pivoted per-series view:
    * a series-qualified term (`purchase.user = '42'`, `error > 900.0`)
    * is true only on that series' rows — on every other row it is
    * FALSE, so `NOT (error > 900.0)` matches all non-error rows too
    * (row-level reading: "delete every row that is not an
    * error-above-900 row"). Reserved 1-part names: `ts` (the time
    * axis) and `series` (the series name) address the physical
    * columns; any other 1-part name is a series' value and a 2-part
    * name a series' attribute (per-point attributes shadow series
    * tags, same as SELECT's decode). One term cannot reference two
    * series — a single long row holds exactly one.
    */
  private[boostql] def deletePredicate(e: Ast.BExpr): Column =
    longPredicate(e, "DELETE")

  /** Shared row-level compile over the LONG layout for the mutate verbs
    * (DELETE predicates, UPDATE predicates and SET expressions). `ctx`
    * names the verb in error messages.
    */
  private[boostql] def longPredicate(e: Ast.BExpr, ctx: String,
      allowSrc: Boolean = false, forbidSrc: Boolean = false): Column = {
    import Ast._
    def scoped(series: Set[String], c: Column): Column = series.toSeq match {
      case Seq() => c
      case Seq(s) => col("series") === lit(s) && c
      case many => throw Compiler.CompileException(
        s"a $ctx term references series ${many.sorted.mkString(", ")} — " +
          "one long row holds one series, so a single comparison cannot " +
          "span two; split it with AND/OR")
    }
    def operand(o: Operand): (Column, Set[String]) =
      longOperand(o, ctx, allowSrc, forbidSrc)
    def walk(e: BExpr): Column = e match {
      case AndE(l, r) => walk(l) && walk(r)
      case OrE(l, r)  => walk(l) || walk(r)
      case NotE(x)    => !walk(x)
      case Cmp(op, l, r) =>
        val (a, as) = operand(l); val (b, bs) = operand(r)
        val c = op match {
          case "="  => a === b
          case "!=" => a =!= b
          case "<"  => a < b
          case ">"  => a > b
          case "<=" => a <= b
          case ">=" => a >= b
        }
        scoped(as ++ bs, c)
      case IsNullE(o, neg) =>
        val (c, s) = operand(o)
        scoped(s, if (neg) c.isNotNull else c.isNull)
      case InE(o, xs, neg) =>
        val (c, s) = operand(o)
        val items = xs.map(operand)
        val folded = items.map(x => c === x._1).reduce(_ || _)
        scoped(s ++ items.flatMap(_._2).toSet,
          if (neg) !folded else folded)
      case BetweenE(o, lo, hi, neg) =>
        val (c, s) = operand(o)
        val (l, ls) = operand(lo); val (h, hs) = operand(hi)
        val b = c >= l && c <= h
        scoped(s ++ ls ++ hs, if (neg) !b else b)
      case LikeE(o, p, neg) =>
        val (c, s) = operand(o)
        val m = c.like(p)
        scoped(s, if (neg) !m else m)
      case _: InSubE | _: ExistsE | _: QuantE => throw Compiler.CompileException(
        s"$ctx predicates cannot contain subqueries — compute the key " +
          "set first and spell it as IN (…)")
    }
    walk(e)
  }

  /** Operand compile for the mutate verbs: series/attribute/ts
    * references, literals, arithmetic, intervals, CAST and the scalar
    * builtins over ONE long row. Returns the column plus the set of
    * series the expression references (a single row holds one series,
    * so callers scope or validate on it).
    */
  private[boostql] def longOperand(o: Ast.Operand, ctx: String,
      allowSrc: Boolean = false,
      forbidSrc: Boolean = false): (Column, Set[String]) = {
    import Ast._
    def operand(o2: Operand): (Column, Set[String]) =
      longOperand(o2, ctx, allowSrc, forbidSrc)
    o match {
      case OLit(l) => (Compiler.litColumn(l), Set.empty)
      // a by-source condition sees the TARGET row only: `src.` would
      // otherwise silently resolve as a series named src
      case ORef(RawName(s +: _)) if forbidSrc && s.equalsIgnoreCase("src") =>
        throw Compiler.CompileException(
          "a WHEN NOT MATCHED BY SOURCE condition sees only the TARGET " +
            "row — there is no source row for an absent key by " +
            "definition; drop the src. prefix")
      // MERGE matched-clause conditions see the SOURCE row through the
      // reserved `src` prefix: src.value is the incoming datapoint,
      // any other src.<k> an incoming attribute (shadowing tags, same
      // decode as the target side); src.ts / src.series equal the
      // target key on a matched row by definition
      case ORef(RawName(Seq(s, f))) if allowSrc && s.equalsIgnoreCase("src") =>
        if (f.equalsIgnoreCase("value")) (col("src_value"), Set.empty)
        else if (f.equalsIgnoreCase("ts")) (col("ts"), Set.empty)
        else if (f.equalsIgnoreCase("series")) (col("series"), Set.empty)
        else (coalesce(element_at(col("src_attributes"), f),
          element_at(col("src_tags"), f)), Set.empty)
      case ORef(RawName(Seq(t))) if t.equalsIgnoreCase("ts") =>
        (col("ts"), Set.empty)
      case ORef(RawName(Seq(t))) if t.equalsIgnoreCase("series") =>
        (col("series"), Set.empty)
      case ORef(name) => Compiler.resolve(name, None) match {
        case FieldRef(s, None) => (col("value"), Set(s))
        case FieldRef(s, Some(a)) =>
          (coalesce(element_at(col("attributes"), a),
            element_at(col("tags"), a)), Set(s))
      }
      case OArith(op, l, r: OInterval) =>
        if (op != "+" && op != "-") throw Compiler.CompileException(
          s"INTERVAL supports only + and -, not $op")
        val (base, ss) = operand(l)
        val shifted = Compiler.parseIntervalMicros(r.text) match {
          case Some(us) =>
            val iv = lit(java.time.Duration.ofNanos(
              math.multiplyExact(us, 1000L)))
            if (op == "+") base.cast("timestamp") + iv
            else base.cast("timestamp") - iv
          case None =>
            val m = Compiler.parseIntervalMonths(r.text)
              .getOrElse(throw Compiler.CompileException(
                s"malformed INTERVAL '${r.text}'"))
            base.cast("timestamp") +
              make_ym_interval(lit(0), lit(if (op == "+") m else -m))
        }
        (shifted, ss)
      case OArith("+", l: OInterval, r) => operand(OArith("+", r, l))
      case OArith(op, l, r) =>
        val (a, as) = operand(l); val (b, bs) = operand(r)
        val c = op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "/" => a / b
        }
        (c, as ++ bs)
      case ONeg(x) => val (c, s) = operand(x); (-c, s)
      case OCast(x, ty) =>
        val (c, s) = operand(x)
        val t = ty match {
          case "int" => "long"
          case "float" => "double"
          case "string" => "string"
          case "bool" => "boolean"
          case other => throw Compiler.CompileException(
            s"CAST to unknown type '$other'")
        }
        (c.cast(t), s)
      // the scalar builtins (all row-level, codegen'd) — carries the
      // DATE/TIMESTAMP literal desugar (to_date/to_timestamp) plus the
      // everyday normalizations (upper/lower/trim/epoch_us) a takedown
      // predicate reaches for
      case OFn(fn, args) =>
        Compiler.scalarFns.get(fn) match {
          case Some((lo, hi, build)) =>
            if (args.length < lo || args.length > hi)
              throw Compiler.CompileException(
                s"$fn() takes $lo..$hi arguments, got ${args.length}")
            val compiled = args.map(operand)
            (build(compiled.map(_._1)), compiled.flatMap(_._2).toSet)
          case None => throw Compiler.CompileException(
            s"$fn() is not available in $ctx terms — the scalar " +
              "builtins only (window/time-series functions have no " +
              "row-level meaning here)")
        }
      // searched CASE (row-level): conditions ride the same scoped
      // compile as WHERE terms, branch values the operand grammar —
      // `SET click = CASE WHEN click > 900.0 THEN 900.0 ELSE click END`
      // is the clamping-correction shape
      case OCase(branches, otherwise) =>
        val compiled = branches.map { case (cond, v) =>
          (longPredicate(cond, ctx, allowSrc), operand(v))
        }
        val (oc, os) = otherwise.map(operand)
          .getOrElse((lit(null), Set.empty[String]))
        val chained = compiled.tail.foldLeft(
          when(compiled.head._1, compiled.head._2._1)) {
          case (acc, (c, (v, _))) => acc.when(c, v)
        }
        (chained.otherwise(oc), compiled.flatMap(_._2._2).toSet ++ os)
      case other => throw Compiler.CompileException(
        s"$ctx terms support series/attribute/ts references, " +
          "literals, arithmetic, intervals, CAST, CASE and the scalar " +
          "builtins — not " +
          other.getClass.getSimpleName.stripSuffix("$"))
    }
  }

  /** `INSERT INTO domain.family <select>` against STREAMING family
    * frames — continuous SQL ingest, the ETL-pipeline face of the
    * north star: the same INSERT text that runs in batch keeps a family
    * continuously fed from a live source. Two tiers by `watermark`:
    *
    *  - None: the STATELESS subset (projection + WHERE through
    *    [[sqlStream]]'s whitelist) — a filtering/renaming/derived-series
    *    pass-through pipe, no state store;
    *  - Some(delay): the watermarked aggregate subset — the CONTINUOUS
    *    DOWNSAMPLING idiom (InfluxQL continuous queries / TimescaleDB
    *    continuous aggregates): alias the time key `ts` (uncast, so it
    *    stays the new family's time axis) and each aggregate becomes a
    *    series of the target family. Every watermarked shape the SQL
    *    front compiles materializes: `bucket(ts, …)` tumbling windows,
    *    `session(ts, …)` session windows (the time axis is the session
    *    start), and the JOINED-STREAM windowed aggregate (stream-stream
    *    interval join + `bucket(x.ts, …)` rollup — the
    *    enrich-then-materialize pipeline). Dimension group keys (user)
    *    ride along as per-point attributes ([[insertLong]]'s string
    *    rule). The parquet sink appends FINALIZED windows only (state
    *    evicts behind the watermark), so the target trails the source
    *    by the watermark delay — the price of exactly-once
    *    downsampling over late data.
    *
    * Same shape contract as [[sqlInsert]] (timestamp `ts` + numeric
    * series columns, validated before stream start); same
    * date-partitioned checkpointed sink as a hand-built ingest job.
    * AvailableNow trigger: drains the current backlog, then returns —
    * swap the trigger for a production run-forever deployment.
    */
  def sqlStreamInsert(stmt: String, families: ((String, String)) => DataFrame,
      root: String, watermark: Option[String] = None): Unit = stmt match {
    case insertRe(dom, fam, rest) =>
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      val df = watermark.fold(sqlStream(rest, families))(d =>
        sqlStream(rest, families, d))
      val long = insertLong(df).withColumn("dt", to_date(col("ts")))
      val q = long.writeStream
        .format("parquet")
        .option("path", s"$root/$dom/$fam")
        .option("checkpointLocation", s"$root/.checkpoints/$dom.$fam")
        .partitionBy("dt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    case _ => throw Compiler.CompileException(
      "INSERT must be 'INSERT INTO domain.family SELECT …'")
  }

  /** Shared INSERT shape contract + UNPIVOT onto the family long
    * layout; works identically on batch and streaming frames (the
    * unpivot is a map-side Expand). See [[sqlInsert]] for the rules.
    *
    * DIMENSION columns: a STRING column is a per-row dimension (the
    * grouped-rollup shape — `GROUP BY bucket(ts, …), user`) and lands
    * as a per-point ATTRIBUTE named by the column on every series row
    * unpivoted from its source row, so the reread family answers
    * `SELECT n.user, n FROM dom.rollup` exactly like a raw family.
    * (Attributes, not tags: tags are series-constant by the data
    * model, a dimension varies per row.) Numeric columns are the
    * series, as before; at least one is required — a dimensions-only
    * select has nothing to plot on the value axis.
    */
  private def insertLong(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    {
      val cols = df.columns.toSeq
      if (cols.count(_ == "ts") != 1 ||
          df.schema("ts").dataType != TimestampType)
        throw Compiler.CompileException(
          "INSERT needs the select to propagate the time axis as a " +
            "timestamp column named ts")
      val rest = cols.filterNot(_ == "ts")
      rest.groupBy(identity).collect { case (c, dup) if dup.length > 1 =>
        throw Compiler.CompileException(
          s"INSERT value columns must have distinct names ('$c' repeats " +
            "— alias the select items)")
      }
      val reserved = Set("series", "value", "tags", "attributes", "dt")
      rest.find(reserved).foreach(c => throw Compiler.CompileException(
        s"INSERT value column '$c' collides with the family layout — " +
          "alias it to the intended series name"))
      val (dimCols, valueCols) =
        rest.partition(c => df.schema(c).dataType == StringType)
      if (valueCols.isEmpty) throw Compiler.CompileException(
        "INSERT needs at least one numeric value column besides ts " +
          "(each becomes a series named by the column; string columns " +
          "are dimensions and become per-point attributes)")
      valueCols.find(c => !df.schema(c).dataType.isInstanceOf[NumericType])
        .foreach(c => throw Compiler.CompileException(
          s"INSERT value column '$c' is " +
            s"${df.schema(c).dataType.simpleString} — series values are " +
            "numeric (and dimensions are strings)"))
      val emptyMap = map().cast(MapType(StringType, StringType))
      val attrs =
        if (dimCols.isEmpty) emptyMap
        else map(dimCols.flatMap(c => Seq(lit(c), col(c))): _*)
      df.select((col("ts") +: dimCols.map(col)) ++
          valueCols.map(c => col(c).cast("double").as(c)): _*)
        .unpivot((col("ts") +: dimCols.map(col)).toArray,
          valueCols.map(col).toArray, "series", "value")
        .filter(col("value").isNotNull)
        .select(col("series"), col("ts"), col("value"),
          emptyMap.as("tags"), attrs.as("attributes"))
    }
  }

  def sql(query: String, families: ((String, String)) => DataFrame): DataFrame =
    query match {
      case showRe(_) => throw Compiler.CompileException(
        "SHOW FAMILIES needs an enumerable registry — pass the families " +
          "as a Map (the sql(query, Map) overload); a resolver function " +
          "cannot be listed")
      case showPartsShapeRe() => throw Compiler.CompileException(
        "SHOW PARTITIONS is a warehouse statement — it inventories a " +
          "family's physical date partitions, which a query frame cannot " +
          "see; use BoostQL.sqlShowPartitions(stmt, spark, root)")
      case describeRe(dom, f) => describe(families((dom, f)))
      case funnelRe(steps, attr, within, dom, f) =>
        funnelStmt(steps, attr, within, families((dom, f)))
      case retentionRe(attr, maxDays, dom, f) =>
        retentionStmt(attr, maxDays, families((dom, f)))
      case outliersRe(series, k, dom, f) =>
        outliersStmt(series, k, families((dom, f)))
      case explainRe(mode, rest) =>
        val df = Compiler.compile(Parser.parseStmt(rest), families)
        val m = Option(mode).map(_.toLowerCase).getOrElse("formatted")
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(m))
        val spark = df.sparkSession
        import spark.implicits._
        Seq(plan).toDF("plan")
      case dmlRe(verb) =>
        val v = verb.toLowerCase
        val entry = v match {
          case "merge"   => "sqlMerge"
          case "create"  => "sqlCreateFamily"
          case "drop"    => "sqlDropFamily"
          case "refresh" => "sqlRefreshRollup"
          case other     => s"sql${other.capitalize}"
        }
        throw Compiler.CompileException(
          s"${v.toUpperCase} is a write statement — sql() compiles read " +
            s"queries; use BoostQL.$entry(stmt, …) " +
            "(INSERT/UPSERT/MERGE/CREATE take the families resolver, " +
            "DELETE/UPDATE/DROP/REFRESH take the warehouse root)")
      case _ => Compiler.compile(Parser.parseStmt(query), families)
    }

  private val dmlRe =
    """(?is)^\s*(insert|upsert|delete|update|merge|create|drop|refresh)\b.*$""".r

  /** `REFRESH ROLLUP domain.family BUCKET '<interval>' AS <label>
    * [INTO domain.family2]` — the SQL face of
    * [[TimeSeriesTable.refreshDownsample]]: materialize or
    * incrementally maintain the family's fixed-width rollup, touching
    * only the source dates whose file set changed since the last
    * refresh. The bucket must be a fixed day-divisible width (derived
    * rows must stay on their source date for the per-date swap).
    * Returns (rebuilt partitions, dropped partitions).
    */
  def sqlRefreshRollup(stmt: String, spark: SparkSession,
      root: String): (Seq[String], Seq[String]) = {
    val refreshRe =
      ("""(?is)^\s*refresh\s+rollup\s+(\w+)\s*\.\s*(\w+)\s+bucket\s+""" +
        """'([^']+)'\s+as\s+(\w+)(?:\s+into\s+(\w+)\s*\.\s*(\w+))?\s*$""").r
    stmt match {
      case refreshRe(dom, fam, width, label, intoDom, intoFam) =>
        val us = Compiler.parseIntervalMicros(width).getOrElse(
          throw Compiler.CompileException(
            s"REFRESH ROLLUP bucket '$width' must be a fixed width " +
              "(microsecond…day) — calendar widths cannot stay on one " +
              "source date"))
        if (us <= 0 || 86400000000L % us != 0)
          throw Compiler.CompileException(
            "REFRESH ROLLUP bucket must be positive and divide one day " +
              "— a wider bucket straddles date partitions; use " +
              "downsample() for a one-shot wider rollup")
        if (intoDom != null && intoDom != dom)
          throw Compiler.CompileException(
            "REFRESH ROLLUP INTO must target the same domain — the " +
              "refresh manifest lives beside the derived family")
        TimeSeriesTable.refreshDownsample(spark, root, dom, fam, us,
          label, Option(intoFam))
      case _ => throw Compiler.CompileException(
        "REFRESH ROLLUP takes 'REFRESH ROLLUP domain.family BUCKET " +
          "'<interval>' AS <label> [INTO domain.family2]'")
    }
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
    val spec = Parser.parseStmt(query) match {
      case q: graft.boostql.Ast.QuerySpec => q
      case _ => throw Compiler.CompileException(
        "streaming queries do not support set operations")
    }
    def refuse(cond: Boolean, what: String): Unit =
      if (cond) throw Compiler.CompileException(
        s"streaming queries support stateless projection + WHERE only; " +
          s"$what is not supported (use sqlStream(query, families, " +
          "watermark) for the bucket()-keyed aggregate form, or the " +
          "watermarked StreamingOps tier for other stateful streams)")
    refuse(spec.joins.nonEmpty, "JOIN")
    refuse(spec.groupBy.nonEmpty || spec.having.nonEmpty, "GROUP BY/HAVING")
    refuse(spec.fill.isDefined, "FILL")
    refuse(spec.orderBy.nonEmpty, "ORDER BY")
    refuse(spec.limit.isDefined, "LIMIT")
    refuse(spec.distinct, "DISTINCT")
    refuse(spec.qualify.isDefined, "QUALIFY")
    val df = Compiler.compile(spec, families)
    statelessSweep(df, refuse)
    df
  }

  /** WHITELIST sweep over the ANALYZED plan (window expressions only
    * become logical.Window nodes at analysis — pre-analysis they hide
    * inside a Project): only Project/Filter over leaf relations (plus
    * the aliasing wrappers analysis leaves in place) are stateless; a
    * blacklist would miss shapes reachable through derived tables
    * (inner DISTINCT → Deduplicate, inner LIMIT → GlobalLimit, inner
    * set ops → Except/Intersect, …), which would then fail at stream
    * start or silently grow unbounded state.
    *
    * Deliberate asymmetry: set-operation COMPOUNDS refuse up front at
    * the parse match (a UNION body re-scans the source per branch —
    * never stateless), while a WITH CTE whose substitution yields a
    * pure projection/filter shape passes this sweep: the CTE is just
    * naming, and the analyzed plan it produces is the same stateless
    * Project/Filter chain a plain SELECT would compile to.
    */
  private def statelessSweep(df: DataFrame,
      refuse: (Boolean, String) => Unit): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical
    df.queryExecution.analyzed.foreach {
      case _: logical.Project | _: logical.Filter |
           _: logical.SubqueryAlias | _: logical.LeafNode => ()
      case j: logical.Join =>
        refuse(true, s"multi-series alignment (a stream-stream ${j.nodeName})")
      case other => refuse(true, s"the ${other.nodeName} operator")
    }
  }

  /** The STATEFUL streaming subset: a watermarked, bucket()-keyed
    * continuous aggregate — `SELECT bucket(ts, '5 minutes') AS b[,
    * key…], agg(x) AS a… FROM dom.family [WHERE …] GROUP BY b[, key…]`
    * — the reference's north star (time-series functions on the SQL
    * front, README.md:8) reaching live data. Everything else stateful
    * keeps refusing with a pointer at the right tier.
    *
    * Compilation is two-layer, so the event-time machinery is REAL:
    * the projection/filter half compiles through the ordinary dialect
    * compiler (same pushed-filter scan as batch, stateless-swept), and
    * the aggregation is assembled as `withWatermark(ts, delay) →
    * groupBy(window(ts, width), keys…) → agg` — the engine-recognized
    * tumbling event-time window (identical epoch alignment to
    * `bucket()`), NOT a groupBy over opaque timestamp arithmetic. That
    * distinction is what makes the watermark actually bound state: the
    * state store evicts windows older than the watermark, and append
    * output mode works (emit-on-finalize); opaque arithmetic keys
    * would aggregate but never evict.
    *
    * Accepted shape — single family source; exactly one
    * `bucket(ts, '<fixed width>')` group key (optionally wrapped
    * `CAST(… AS int)` for epoch seconds), selected under an alias;
    * further plain-field group keys allowed (bounded dimension keys);
    * every aggregate aliased and one of count/sum/avg/min/max (the
    * partial-mergeable streaming-safe set — count(DISTINCT)/median/
    * percentile/sketches refuse). Calendar bucket widths refuse (the
    * engine's tumbling window needs a fixed width). HAVING is
    * supported as a STATELESS filter on the finalized aggregate rows
    * (append mode emits a window once, then the filter applies exactly
    * like batch HAVING — extra aggregates it names are computed hidden
    * and dropped); ORDER BY/LIMIT/DISTINCT/QUALIFY refuse: on an
    * unbounded stream they are sink-side concerns.
    */
  def sqlStream(query: String, families: ((String, String)) => DataFrame,
      watermarkDelay: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.boostql.Ast._
    val spec = Parser.parseStmt(query) match {
      case q: QuerySpec => q
      case _ => throw Compiler.CompileException(
        "streaming queries do not support set operations")
    }
    if (spec.joins.nonEmpty)
      return sqlStreamJoin(spec, families, watermarkDelay)
    def refuse(cond: Boolean, what: String): Unit =
      if (cond) throw Compiler.CompileException(
        "watermarked streaming aggregation supports a bucket(ts, …) " +
          s"group key + count/sum/avg/min/max only; $what is not " +
          "supported (use the watermarked StreamingOps tier)")
    refuse(spec.fill.isDefined,
      "FILL (densify at the sink — an unbounded stream has no final " +
        "bucket extent to densify against)")
    refuse(spec.orderBy.nonEmpty, "ORDER BY (sort at the sink)")
    refuse(spec.limit.isDefined, "LIMIT")
    refuse(spec.distinct, "DISTINCT")
    refuse(spec.qualify.isDefined, "QUALIFY")
    refuse(spec.groupMode != "plain", "ROLLUP/CUBE/GROUPING SETS")
    refuse(spec.hints.nonEmpty, "an optimizer hint")
    if (spec.groupBy.isEmpty) throw Compiler.CompileException(
      "no GROUP BY — use sqlStream(query, families) for the stateless tier")
    val srcAlias = spec.source.alias
    val aliasOf: Map[String, Operand] =
      spec.select.collect { case ExprItem(e, nm) => nm -> e }.toMap
    // bucket(ts, 'w'[, 'slide']) or CAST(bucket(…) AS int) — the
    // event-time key; a third argument makes it a SLIDING window
    // (window(ts, w, slide): map-side Expand, w/slide live windows per
    // event in the state store). session(ts, '<gap>') is the GAP-keyed
    // event-time key: the engine's session_window, whose state-store
    // entries are OPEN sessions merged/extended as events arrive and
    // finalized when the watermark passes last-event + gap — the
    // continuous form of the batch dialect's session() window function
    // (there a per-key gaps-and-islands id; here the group key itself).
    def bucketShape(e: Operand): Option[(String, Option[String], Boolean)] = e match {
      case OFn("bucket", Seq(ORef(n), OLit(BStr(w))))
        if n.parts.last.equalsIgnoreCase("ts") => Some((w, None, false))
      case OFn("bucket", Seq(ORef(n), OLit(BStr(w)), OLit(BStr(sl))))
        if n.parts.last.equalsIgnoreCase("ts") => Some((w, Some(sl), false))
      case OCast(inner, ty) => bucketShape(inner).map { case (w, sl, _) =>
        if (ty != "int") throw Compiler.CompileException(
          s"streaming bucket key CAST must target int (epoch seconds), not $ty")
        (w, sl, true)
      }
      case _ => None
    }
    def sessionShape(e: Operand): Option[(String, Boolean)] = e match {
      case OFn("session", Seq(ORef(n), OLit(BStr(g))))
        if n.parts.last.equalsIgnoreCase("ts") => Some((g, false))
      case OCast(inner, ty) => sessionShape(inner).map { case (g, _) =>
        if (ty != "int") throw Compiler.CompileException(
          s"streaming session key CAST must target int (epoch seconds), not $ty")
        (g, true)
      }
      case _ => None
    }
    // classify group entries: ONE time key — bucket(ts, …) or
    // session(ts, …), by select alias — + plain dimension fields
    var bucket: Option[(String, String, Option[String], Boolean)] = None // (alias, width, slide, cast)
    var session: Option[(String, String, Boolean)] = None // (alias, gap, cast)
    val dims = Seq.newBuilder[(RawName, String)]          // (field, outName)
    def oneTimeKey(): Unit =
      if (bucket.isDefined || session.isDefined) throw Compiler.CompileException(
        "watermarked streaming aggregation takes exactly one " +
          "bucket(ts, …) or session(ts, …) group key")
    spec.groupBy.foreach { n =>
      n.parts match {
        case Seq(one) if aliasOf.contains(one) =>
          (bucketShape(aliasOf(one)), sessionShape(aliasOf(one)),
              aliasOf(one)) match {
            case (Some((w, sl, c)), _, _) =>
              oneTimeKey(); bucket = Some((one, w, sl, c))
            case (_, Some((g, c)), _) =>
              oneTimeKey(); session = Some((one, g, c))
            case (None, None, ORef(f)) => dims += ((f, one))
            case _ => throw Compiler.CompileException(
              s"streaming GROUP BY alias '$one' must name a " +
                "bucket(ts, …) / session(ts, …) item or a plain field")
          }
        case _ =>
          if (n.parts.last.equalsIgnoreCase("ts"))
            throw Compiler.CompileException(
              "GROUP BY ts groups every point alone — use bucket(ts, …)")
          dims += ((n, Compiler.resolve(n, srcAlias).colName))
      }
    }
    if (bucket.isEmpty && session.isEmpty) throw Compiler.CompileException(
      "watermarked streaming aggregation needs a bucket(ts, '<width>') " +
        "or session(ts, '<gap>') group key selected under an alias")
    val (bAlias, bCast) = bucket.map(b => (b._1, b._4))
      .getOrElse((session.get._1, session.get._3))
    val widthSlideUs: Option[(Long, Option[Long])] = bucket.map {
      case (_, bWidth, bSlide, _) =>
        val widthUs = Compiler.parseIntervalMicros(bWidth).getOrElse(
          throw Compiler.CompileException(
            s"streaming bucket width '$bWidth' must be fixed-width " +
              "(microsecond…day) — the engine's tumbling window cannot " +
              "evict calendar-width state"))
        if (widthUs <= 0)
          throw Compiler.CompileException("bucket() width must be positive")
        // sliding form: same divisibility contract as the batch
        // expansion (every event in exactly width/slide windows)
        val slideUs = bSlide.map { sl =>
          val v = Compiler.parseIntervalMicros(sl).getOrElse(
            throw Compiler.CompileException(
              s"streaming bucket slide '$sl' must be fixed-width " +
                "(microsecond…day)"))
          if (v <= 0) throw Compiler.CompileException(
            "bucket() slide must be positive")
          if (v > widthUs) throw Compiler.CompileException(
            "bucket() slide must not exceed the width — a larger slide " +
              "leaves gaps (filter rows instead)")
          if (widthUs % v != 0) throw Compiler.CompileException(
            "bucket() width must be a multiple of the slide so every " +
              "event is in exactly width/slide windows")
          v
        }
        (widthUs, slideUs)
    }
    val sessionGapUs: Option[Long] = session.map { case (_, g, _) =>
      val v = Compiler.parseIntervalMicros(g).getOrElse(
        throw Compiler.CompileException(
          s"streaming session gap '$g' must be fixed-width " +
            "(microsecond…day) — open-session state cannot evict under " +
            "a calendar-width gap"))
      if (v <= 0) throw Compiler.CompileException(
        "session() gap must be positive")
      v
    }
    // session state is OPEN sessions per (dims) key: the engine
    // requires at least one non-window grouping key in a streaming
    // query (a global session merge is unsupported) — checked here,
    // before the sub-select compile, so the refusal names the real
    // reason instead of a downstream resolution error
    if (session.isDefined && dims.result().isEmpty)
      throw Compiler.CompileException(
        "streaming session(ts, …) aggregation needs at least one plain " +
          "grouping key besides the session — a global session merge is " +
          "not supported by the engine (group by the series/user key " +
          "whose activity defines the session)")
    // classify select items; build the stateless sub-select (agg args +
    // dimension fields + the time axis) and the final agg/projection
    val dimNames = dims.result()
    val subItems = scala.collection.mutable.LinkedHashMap.empty[String, SelectItem]
    dimNames.foreach { case (f, out) =>
      subItems.getOrElseUpdate(out,
        if (out == Compiler.resolve(f, srcAlias).colName) FieldItem(f)
        else ExprItem(ORef(f), out))
    }
    // count/sum/avg/min/max are the partial-mergeable built-ins;
    // approx_top_k rides along because its Misra-Gries summary IS
    // bounded mergeable state — the continuous heavy-hitters form —
    // and histogram because its fixed bin counts are plain sums: the
    // continuous-distribution form (histogram_quantile reads
    // percentiles off the emitted windows downstream).
    // (count(DISTINCT)/median/percentile stay refused)
    val streamingAggs = Set("count", "sum", "avg", "min", "max",
      "approx_top_k", "histogram")
    var helperIdx = 0
    sealed trait Out
    case class BucketOut(nm: String) extends Out
    case class DimOut(nm: String) extends Out
    case class AggOut(fn: String, argCol: Option[String], nm: String,
        k: Option[Int] = None, hist: Option[Seq[Double]] = None) extends Out
    def aggOut(fn: String, arg: Option[Operand], nm: String,
        k: Option[Int] = None, hist: Option[Seq[Double]] = None): AggOut = {
      if (!streamingAggs.contains(fn)) throw Compiler.CompileException(
        s"$fn() is not streaming-safe — supported streaming aggregates: " +
          "count, sum, avg, min, max, approx_top_k, histogram")
      arg match {
        case None => AggOut(fn, None, nm, k, hist)
        case Some(ORef(f)) =>
          val cn = Compiler.resolve(f, srcAlias).colName
          subItems.getOrElseUpdate(cn, FieldItem(f))
          AggOut(fn, Some(cn), nm, k, hist)
        case Some(e) =>
          val hn = s"__sa$helperIdx"; helperIdx += 1
          subItems.getOrElseUpdate(hn, ExprItem(e, hn))
          AggOut(fn, Some(hn), nm, k, hist)
      }
    }
    // structural aggregate-shape -> output column, so a HAVING that
    // names an already-selected aggregate reuses its column instead of
    // aggregating twice
    val aggByShape = scala.collection.mutable.Map.empty[Operand, String]
    // an aggregate EXPRESSION (arithmetic/CAST/CASE/allowlisted scalar
    // functions over streaming-safe aggregates — the shape the
    // corr/covar/regr parse-time desugar produces): every contained
    // aggregate becomes hidden watermarked state, the surrounding
    // arithmetic applies STATELESSLY to the finalized window rows —
    // continuous correlation / OLS drift detection through the SQL
    // front, no new state kinds
    case class ExprOut(nm: String, e: Operand) extends Out
    def bexprHasAgg(e: BExpr): Boolean = e match {
      case Cmp(_, l, r)  => hasAggIn(l) || hasAggIn(r)
      case AndE(l, r)    => bexprHasAgg(l) || bexprHasAgg(r)
      case OrE(l, r)     => bexprHasAgg(l) || bexprHasAgg(r)
      case NotE(x)       => bexprHasAgg(x)
      case IsNullE(o, _) => hasAggIn(o)
      case BetweenE(o, lo, hi, _) =>
        hasAggIn(o) || hasAggIn(lo) || hasAggIn(hi)
      case InE(o, xs, _) => hasAggIn(o) || xs.exists(hasAggIn)
      case _             => false
    }
    def hasAggIn(o: Operand): Boolean = o match {
      case _: OAgg | _: OAggX => true
      case OArith(_, l, r)    => hasAggIn(l) || hasAggIn(r)
      case ONeg(x)            => hasAggIn(x)
      case OCast(x, _)        => hasAggIn(x)
      case OFn(_, as)         => as.exists(hasAggIn)
      case OCase(bs, el)      =>
        bs.exists { case (c, v) => bexprHasAgg(c) || hasAggIn(v) } ||
          el.exists(hasAggIn)
      case _                  => false
    }
    val outs: Seq[Out] = spec.select.map {
      case ExprItem(e, nm) if nm == bAlias &&
          (bucketShape(e).isDefined || sessionShape(e).isDefined) =>
        BucketOut(nm)
      case ExprItem(ORef(_), nm) if dimNames.exists(_._2 == nm) => DimOut(nm)
      case FieldItem(n)
        if dimNames.exists(_._2 == Compiler.resolve(n, srcAlias).colName) =>
        DimOut(Compiler.resolve(n, srcAlias).colName)
      case it @ ExprItem(OAgg(fn, arg), nm) =>
        val o = aggOut(fn, arg.map(ORef), nm); aggByShape(it.expr) = nm; o
      case it @ ExprItem(OAggX("approx_top_k", e, Seq(k), _), nm) =>
        val o = aggOut("approx_top_k", Some(e), nm, Some(k.toInt))
        aggByShape(it.expr) = nm; o
      case it @ ExprItem(OAggX("histogram", e, ps @ Seq(_, _, _), _), nm) =>
        val o = aggOut("histogram", Some(e), nm, hist = Some(ps))
        aggByShape(it.expr) = nm; o
      case it @ ExprItem(OAggX(fn, e, ps, a2), nm) =>
        if (ps.nonEmpty || a2.nonEmpty) throw Compiler.CompileException(
          s"$fn() is not streaming-safe — supported streaming " +
            "aggregates: count, sum, avg, min, max, approx_top_k")
        val o = aggOut(fn, Some(e), nm); aggByShape(it.expr) = nm; o
      case ExprItem(e, nm) if hasAggIn(e) => ExprOut(nm, e)
      case _: AggItem => throw Compiler.CompileException(
        "streaming aggregates must be aliased (agg(x) AS name)")
      case other => throw Compiler.CompileException(
        "streaming select items must be the bucket key, a grouping " +
          "field, an aliased aggregate, or an expression over " +
          "streaming-safe aggregates")
    }
    val aggs = outs.collect { case a: AggOut => a }
    if (aggs.isEmpty && !outs.exists(_.isInstanceOf[ExprOut]))
      throw Compiler.CompileException(
        "watermarked streaming aggregation needs at least one aggregate")
    /* HAVING: a STATELESS filter on the FINALIZED aggregate rows —
     * append mode emits a window once (on watermark passage), the
     * filter then applies exactly like batch HAVING; no second
     * aggregation, no new state. Aggregates in the condition join the
     * aggregate list (hidden columns when not selected, dropped after
     * the filter); operands are literals, select aliases, and
     * streaming-safe aggregates — anything else refuses. */
    val extraAggs = Seq.newBuilder[AggOut]
    val hidden = Seq.newBuilder[String]
    var haIdx = 0
    def havingAggCol(e: Operand): String = aggByShape.getOrElse(e, {
      val nm = s"__ha$haIdx"; haIdx += 1
      val out = e match {
        case OAgg(fn, arg) => aggOut(fn, arg.map(ORef), nm)
        case OAggX("approx_top_k", x, Seq(k), _) =>
          aggOut("approx_top_k", Some(x), nm, Some(k.toInt))
        case OAggX(fn, x, ps, a2) =>
          if (ps.nonEmpty || a2.nonEmpty) throw Compiler.CompileException(
            s"$fn() is not streaming-safe — supported streaming " +
              "aggregates: count, sum, avg, min, max, approx_top_k")
          aggOut(fn, Some(x), nm)
        case _ => throw Compiler.CompileException(
          "unreachable: havingAggCol on a non-aggregate")
      }
      extraAggs += out; hidden += nm; aggByShape(e) = nm
      nm
    })
    // expression-item names materialize in the same projection step, so
    // a reference to one (from HAVING or another expression) inlines its
    // OPERAND instead of naming a column that may not exist yet; a
    // cyclic reference refuses instead of looping
    val exprByName: Map[String, Operand] =
      outs.collect { case ExprOut(nm, e) => nm -> e }.toMap
    val expanding = scala.collection.mutable.Set.empty[String]
    val outNames: Set[String] = outs.map {
      case BucketOut(nm) => nm
      case DimOut(nm) => nm
      case AggOut(_, _, nm, _, _) => nm
      case ExprOut(nm, _) => nm
    }.toSet
    def hRefuse(what: String): Nothing = throw Compiler.CompileException(
      s"streaming aggregate expressions (HAVING and expression select " +
        s"items) support literals, select-output names, arithmetic, " +
        s"CAST, CASE, the scalar builtins and streaming-safe " +
        s"aggregates only; $what is not supported")
    def hOp(o: Operand): Column = o match {
      case OLit(l)    => Compiler.litColumn(l)
      case e: OAgg    => col(havingAggCol(e))
      case e: OAggX   => col(havingAggCol(e))
      case ORef(n) if n.parts.length == 1 && exprByName.contains(n.parts.head) =>
        val nm = n.parts.head
        if (!expanding.add(nm))
          hRefuse(s"'$nm' (a cyclic expression-alias reference)")
        try hOp(exprByName(nm)) finally expanding.remove(nm)
      case ORef(n) if n.parts.length == 1 && outNames(n.parts.head) =>
        col(n.parts.head)
      case ORef(n) => hRefuse(
        s"'${n.parts.mkString(".")}' (name a select output)")
      case OArith(op, l, r) =>
        val (a, b) = (hOp(l), hOp(r))
        op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "/" => a / b
        }
      case ONeg(x) => -hOp(x)
      case OCast(x, t) => hOp(x).cast(t match {
        case "int" => "long"
        case "float" => "double"
        case "string" => "string"
        case "bool" => "boolean"
        case other => hRefuse(s"CAST to $other")
      })
      // the allowlisted scalar builtins and CASE — enough to carry the
      // corr/covar/regr desugar trees (sqrt/coalesce + guards) and
      // ordinary rounding/formatting of finalized aggregates
      case OFn(fn, args) =>
        Compiler.scalarFns.get(fn) match {
          case Some((lo, hi, build)) =>
            if (args.length < lo || args.length > hi)
              hRefuse(s"$fn() with ${args.length} argument(s)")
            build(args.map(hOp))
          case None => hRefuse(s"function $fn()")
        }
      case OCase(bs, el) =>
        val first = when(hB(bs.head._1), hOp(bs.head._2))
        val folded = bs.tail.foldLeft(first)((c, b) =>
          c.when(hB(b._1), hOp(b._2)))
        el.fold(folded)(e => folded.otherwise(hOp(e)))
      case _ => hRefuse("this expression form")
    }
    def hB(e: BExpr): Column = e match {
      case Cmp(op, l, r) =>
        val (a, b) = (hOp(l), hOp(r))
        op match {
          case "=" | "==" => a === b
          case "!=" | "<>" => a =!= b
          case "<" => a < b
          case "<=" => a <= b
          case ">" => a > b
          case ">=" => a >= b
        }
      case AndE(l, r)    => hB(l) && hB(r)
      case OrE(l, r)     => hB(l) || hB(r)
      case NotE(x)       => !hB(x)
      case IsNullE(o, n) => if (n) hOp(o).isNotNull else hOp(o).isNull
      case BetweenE(o, lo, hi, n) =>
        val c = hOp(o).between(hOp(lo), hOp(hi)); if (n) !c else c
      case InE(o, xs, n) =>
        val c = hOp(o).isin(xs.map(hOp): _*); if (n) !c else c
      case _ => hRefuse("subquery/LIKE predicates")
    }
    val havingCond: Option[Column] = spec.having.map(hB)
    // aggregate-expression select items: walking them through hOp here
    // registers their contained aggregates as hidden columns (the same
    // registration HAVING uses), so allAggs below carries them
    val exprOutCols: Map[String, Column] = outs.collect {
      case ExprOut(nm, e) => nm -> hOp(e).as(nm)
    }.toMap
    val allAggs = aggs ++ extraAggs.result()
    // layer 1: the stateless projection/filter through the ordinary
    // compiler — same pushed-filter scan as batch, swept to stay
    // stateless (a derived-table DISTINCT etc. refuses here)
    val subSpec = QuerySpec(
      select = subItems.values.toSeq :+ FieldItem(RawName(Seq("ts"))),
      source = spec.source, joins = Seq.empty, where = spec.where,
      groupBy = Seq.empty, having = None, orderBy = Seq.empty, limit = None)
    val flat = Compiler.compile(subSpec, families)
    def refuseFlat(cond: Boolean, what: String): Unit =
      refuse(cond, s"$what inside the streamed source")
    statelessSweep(flat, refuseFlat)
    // layer 2: the engine-recognized event-time aggregation — a
    // tumbling/sliding window() or a session_window() (the ≥1-dim
    // session requirement was enforced at classification)
    val win = sessionGapUs match {
      case Some(gap) => session_window(col("ts"), s"$gap microseconds")
      case None =>
        val (widthUs, slideUs) = widthSlideUs.get
        slideUs.fold(window(col("ts"), s"$widthUs microseconds"))(sl =>
          window(col("ts"), s"$widthUs microseconds", s"$sl microseconds"))
    }
    val keyCols = win +: dimNames.map(d => col(d._2))
    val aggCols = allAggs.map { a =>
      val c = a.argCol.map(col)
      (a.fn match {
        case "count" => c.map(count).getOrElse(count(lit(1)))
        case "sum"   => sum(c.get)
        case "avg"   => avg(c.get)
        case "min"   => min(c.get)
        case "max"   => max(c.get)
        case "approx_top_k" =>
          // the MG summary as streaming-aggregation state (capacity-
          // bounded per (window, dims) entry), rendered to the same
          // portable "item:n,…" string as the batch dialect
          val k = a.k.get
          Compiler.freqTopString(graft.functions.GraftFunctions
            .freqSketch(c.get.cast("string"), Compiler.topkCap(k)), k)
        case "histogram" =>
          // nbins plain sums per (window, dims) entry — constant state,
          // the same expression (and the same count string) as batch
          val Seq(lo, hi, nb) = a.hist.get
          Compiler.histogramString(c.get, lo, hi, nb)
      }).as(a.nm)
    }
    val agged = flat.withWatermark("ts", watermarkDelay)
      .groupBy(keyCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val hiddenNames = hidden.result()
    // two-step projection: first materialize every OUTPUT NAME (bucket
    // alias included — `window.start` renames here), then evaluate the
    // expression items against those names. An aggregate expression
    // referencing the bucket alias (`d / 86400`) thereby resolves to
    // the post-rename (post-CAST) bucket value instead of failing
    // against the pre-rename frame where only `window` exists.
    val winCol = if (session.isDefined) "session_window" else "window"
    val named = agged.select((outs.collect {
      case BucketOut(nm) =>
        if (bCast) col(s"$winCol.start").cast("long").as(nm)
        else col(s"$winCol.start").as(nm)
      case DimOut(nm)             => col(nm)
      case AggOut(_, _, nm, _, _) => col(nm)
    } ++ hiddenNames.map(col)): _*)
    val outCols = outs.map {
      case BucketOut(nm)          => col(nm)
      case DimOut(nm)             => col(nm)
      case AggOut(_, _, nm, _, _) => col(nm)
      // stateless arithmetic over the finalized hidden aggregates
      case ExprOut(nm, _)         => exprOutCols(nm)
    }
    val projected = named.select((outCols ++ hiddenNames.map(col)): _*)
    // hidden aggregates serve HAVING and the expression outputs; both
    // paths drop them from the emitted rows
    havingCond match {
      case Some(c) => projected.filter(c).drop(hiddenNames: _*)
      case None    => projected.drop(hiddenNames: _*)
    }
  }

  /** The STREAM-STREAM JOIN subset of the watermarked SQL front:
    * exactly one equi-join — INNER, LEFT/RIGHT/FULL OUTER — between
    * two family sources whose ON bounds the two time axes against each
    * other — the attribution/funnel enrich shape (`ON a.click.user =
    * b.purchase.user AND b.ts BETWEEN a.ts AND a.ts + INTERVAL
    * '1 hour'`). Reached through `sqlStream(query, families,
    * watermarkDelay)` when the statement has a JOIN; with a GROUP BY
    * it chains into [[sqlStreamJoinAgg]] (windowed aggregation over
    * the joined stream). Inner matches emit as soon as both rows
    * arrive; an OUTER side's null-extended rows emit once the OTHER
    * side's watermark passes their match window (so a replay must end
    * with watermark-advancing rows to flush the tail — see
    * [[graft.streaming.StreamingOps.streamSqlLeftJoinReplay]]).
    *
    * Compilation is deliberately thin: each side gets
    * `withWatermark(ts, delay)` at the source, then the ORDINARY
    * dialect compiler builds the same plan it builds in batch — the
    * per-side series filters push to the scans, the equi conjuncts
    * become the join keys, and the interval arithmetic compiles to
    * native ts ± day-time-interval terms, the exact shape the engine's
    * state-eviction analysis recognizes. So the join state is BOUNDED:
    * a row older than the other side's watermark minus the bound can
    * never match again and evicts. That is also why the ON MUST bound
    * both time axes (refused otherwise): an unbounded or half-bounded
    * stream join accretes one side's history forever.
    *
    * Refusals, each with the reason: ASOF (latest-at-or-before orders
    * over the unbounded past — no watermark can evict that state;
    * bound the window explicitly or run it batch), cross joins,
    * derived-table sides, unaliased sides, half-bounded or
    * same-direction-bounded ON clauses, and multi-series sides (the
    * exact-ts align is itself an unbounded stream-stream join).
    * Append output mode.
    */
  private def sqlStreamJoin(spec: Ast.QuerySpec,
      families: ((String, String)) => DataFrame,
      watermarkDelay: String): DataFrame = {
    import graft.boostql.Ast._
    def refuse(cond: Boolean, what: String): Unit =
      if (cond) throw Compiler.CompileException(
        "streaming joins support exactly one INNER or LEFT/RIGHT/FULL " +
          "OUTER equi-join between two family sources with a two-sided " +
          s"time bound in ON; $what is not supported")
    refuse(spec.joins.length > 1, "more than one JOIN")
    val j = spec.joins.head
    if (j.joinType == "asof") throw Compiler.CompileException(
      "streaming ASOF is not supported: latest-at-or-before orders over " +
        "the unbounded past — state no watermark can evict. Bound the " +
        "match window explicitly (ON a.k = b.k AND b.ts BETWEEN a.ts " +
        "AND a.ts + INTERVAL '…') or run ASOF in batch")
    // inner joins emit eagerly; LEFT/RIGHT/FULL OUTER joins emit
    // null-extended rows for the unmatched side(s) once the OTHER
    // side's watermark has passed the row's match window — which the
    // two-sided time bound below makes decidable, so all four are
    // state-bounded under the same analysis. (Semantic note for
    // replays: an outer row's emission WAITS on the watermark, so an
    // AvailableNow run withholds the last `delay + bound` of unmatched
    // rows unless the input ends with rows advancing each side's
    // watermark past the real data — see
    // StreamingOps.streamSqlLeftJoinReplay's flush rows.)
    refuse(!Seq("inner", "left", "right", "full").contains(j.joinType),
      s"${j.joinType.toUpperCase} JOIN")
    refuse(spec.fill.isDefined, "FILL")
    refuse(spec.orderBy.nonEmpty, "ORDER BY (sort at the sink)")
    refuse(spec.limit.isDefined, "LIMIT")
    refuse(spec.distinct, "DISTINCT")
    refuse(spec.qualify.isDefined, "QUALIFY")
    refuse(spec.hints.nonEmpty, "an optimizer hint")
    refuse(!spec.source.isInstanceOf[Source] ||
      !j.source.isInstanceOf[Source], "a derived-table side")
    val cond = j.on.getOrElse(throw Compiler.CompileException(
      "streaming joins need an ON clause — a cross join would hold both " +
        "streams' full history as state"))
    // the ON must bound the two time axes against each other from both
    // sides (a BETWEEN, a >=/<= pair, or exact ts equality)
    val aliases = (spec.source.alias.toSeq ++ j.source.alias.toSeq)
    if (aliases.size < 2) throw Compiler.CompileException(
      "streaming joins need BOTH sides aliased (FROM dom.f AS a JOIN " +
        "dom.g AS b) so the ON can bound each side's time axis")
    def tsAliasOf(o: Operand): Option[String] = o match {
      case ORef(RawName(Seq(al, t)))
        if t.equalsIgnoreCase("ts") && aliases.contains(al) => Some(al)
      case OArith("+" | "-", x, _: OInterval) => tsAliasOf(x)
      case OArith("+", _: OInterval, x)       => tsAliasOf(x)
      case _ => None
    }
    // DIRECTION-tracked bound analysis: a stored row on side Y evicts
    // only when the ON upper-bounds the OTHER side's time axis in
    // terms of Y's (x.ts <= y.ts + δ ⟹ a stored y row at s matches
    // only x.ts <= s + δ, so once X's watermark passes s + δ that y
    // row can never match again — Y's state evicts behind X's
    // watermark). So the check is per SIDE, not a count — two
    // same-direction inequalities (b.ts >= a.ts AND b.ts > a.ts −
    // INTERVAL '1 minute') make only B's state evictable and would
    // leave A's state accreting forever. `x < y` evicts y; `x > y`
    // evicts x (normalize by swapping); equality and a two-sided
    // cross-axis BETWEEN evict both.
    def upperBounded(e: BExpr): Set[String] = e match {
      case AndE(l, r) => upperBounded(l) ++ upperBounded(r)
      case Cmp("<" | "<=", l, r) =>
        (tsAliasOf(l), tsAliasOf(r)) match {
          case (Some(a), Some(b)) if a != b => Set(b)
          case _ => Set.empty
        }
      case Cmp(">" | ">=", l, r) =>
        (tsAliasOf(l), tsAliasOf(r)) match {
          case (Some(a), Some(b)) if a != b => Set(a)
          case _ => Set.empty
        }
      case Cmp("=" | "==", l, r) =>
        (tsAliasOf(l), tsAliasOf(r)) match {
          case (Some(a), Some(b)) if a != b => Set(a, b)
          case _ => Set.empty
        }
      case BetweenE(o, lo, hi, false) =>
        // lo <= o <= hi: `o <= hi` lets HI's side evict (a stored hi
        // row becomes unmatchable once o's watermark passes it);
        // `lo <= o` lets O's side evict (a stored o row becomes
        // unmatchable once lo's watermark passes it)
        val oA = tsAliasOf(o)
        val fromHi = (oA, tsAliasOf(hi)) match {
          case (Some(a), Some(c)) if a != c => Set(c)
          case _ => Set.empty[String]
        }
        val fromLo = (tsAliasOf(lo), oA) match {
          case (Some(b), Some(a)) if a != b => Set(a)
          case _ => Set.empty[String]
        }
        fromHi ++ fromLo
      case _ => Set.empty
    }
    val sidesBounded = upperBounded(cond)
    if (!aliases.forall(sidesBounded.contains)) throw Compiler.CompileException(
      "streaming joins need the ON to bound the two time axes against " +
        "each other from BOTH sides (e.g. b.ts BETWEEN a.ts AND a.ts + " +
        "INTERVAL '1 hour') — an upper bound on EACH side's time axis " +
        "is what lets that side's join state evict behind the other " +
        "side's watermark; an unbounded or half-bounded join accretes " +
        "state forever" +
        (if (sidesBounded.nonEmpty)
          s" (only ${aliases.filter(sidesBounded.contains).mkString(", ")} " +
            "is bounded here)"
        else ""))
    // per-side watermark at the source, then the ordinary batch compile
    val wmFam: ((String, String)) => DataFrame =
      key => families(key).withWatermark("ts", watermarkDelay)
    // sweep the analyzed plan: exactly one join over stateless sides
    def sweepJoin(df: DataFrame): Unit = {
      import org.apache.spark.sql.catalyst.plans.logical
      var joins = 0
      df.queryExecution.analyzed.foreach {
        case _: logical.Project | _: logical.Filter |
             _: logical.SubqueryAlias | _: logical.LeafNode |
             _: logical.EventTimeWatermark => ()
        case _: logical.Join => joins += 1
        case other => refuse(true, s"the ${other.nodeName} operator")
      }
      refuse(joins > 1, "a multi-series side (the exact-ts align is " +
        "itself an unbounded stream-stream join) — reference one series " +
        "per side")
    }
    if (spec.groupBy.nonEmpty || spec.having.isDefined) {
      refuse(j.joinType != "inner",
        s"GROUP BY over a ${j.joinType.toUpperCase} OUTER joined stream " +
          "(the null-extended rows only arrive at watermark finalize, a " +
          "second layer of emission latency the aggregate would compound " +
          "— aggregate the inner join, or the outer join at the sink)")
      refuse(spec.having.isDefined,
        "HAVING over a joined-stream aggregate (filter the finalized " +
          "windows at the sink, or use the single-family form which " +
          "supports HAVING)")
      return sqlStreamJoinAgg(spec, aliases, wmFam, sweepJoin)
    }
    val df = Compiler.compile(spec, wmFam)
    sweepJoin(df)
    df
  }

  /** Windowed aggregation OVER the stream-stream join — the
    * enrich-then-rollup pipeline (join the click stream to the purchase
    * stream, then a per-bucket continuous rollup), compiled as CHAINED
    * STATEFUL OPERATORS in append mode: per-side watermarks at the
    * sources → the interval-bounded inner join (state evicted behind
    * the watermarks + ON bound) → an event-time window aggregate over
    * one side's time axis (state evicted as windows finalize). The
    * engine supports this chaining natively (multiple stateful
    * operators, append mode); the time column keeps its event-time
    * watermark through the join's projection, which is what lets the
    * downstream window aggregate finalize without a second
    * `withWatermark`.
    *
    * Accepted shape, deliberately tight (each refusal names the wider
    * tier): `SELECT [CAST(]bucket(x.ts, '<width>')[ AS int)] AS b[,
    * dim AS d…], agg(expr) AS a… FROM dom.f AS x JOIN dom.g AS y ON
    * <equi + two-sided time bound> GROUP BY b[, d…]` — x.ts names
    * WHICH side's axis buckets the rollup; dims are any scalar select
    * items named in GROUP BY by alias; aggregates are the
    * partial-mergeable count/sum/avg/min/max over any scalar
    * expression of the joined row. No sliding windows (an Expand
    * between two stateful operators), no session keys, no HAVING, no
    * aggregate expressions — those live in the single-family form.
    */
  private def sqlStreamJoinAgg(spec: Ast.QuerySpec, aliases: Seq[String],
      wmFam: ((String, String)) => DataFrame,
      sweepJoin: DataFrame => Unit): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.boostql.Ast._
    def refuse(what: String): Nothing = throw Compiler.CompileException(
      "streaming joined-stream aggregation supports one " +
        "[CAST(]bucket(x.ts, '<width>')[ AS int)] key + plain dimension " +
        "aliases + count/sum/avg/min/max only; " + what +
        " is not supported (the single-family sqlStream form is wider)")
    // bucket(x.ts, 'w') [CAST int] — x one of the two join aliases; no
    // slide (an Expand between two stateful operators)
    def bucketShape(e: Operand): Option[(String, String, Boolean)] = e match {
      case OFn("bucket", Seq(ORef(RawName(Seq(al, t))), OLit(BStr(w))))
        if t.equalsIgnoreCase("ts") && aliases.contains(al) =>
        Some((al, w, false))
      case OFn("bucket", args) if args.length == 3 =>
        refuse("a sliding bucket over a joined stream")
      case OCast(inner, ty) => bucketShape(inner).map { case (al, w, _) =>
        if (ty != "int") refuse(
          s"a bucket key CAST to $ty (epoch-seconds int only)")
        (al, w, true)
      }
      case _ => None
    }
    val aliasOf: Map[String, Operand] =
      spec.select.collect { case ExprItem(e, nm) => nm -> e }.toMap
    // classify the GROUP BY: one bucket alias + dimension aliases (the
    // joined form requires every group key selected under an alias —
    // two-source raw-name resolution belongs to the batch compiler)
    var bucket: Option[(String, String, String, Boolean)] = None // (alias, side, width, cast)
    val dimAliases = Seq.newBuilder[String]
    spec.groupBy.foreach { n =>
      n.parts match {
        case Seq(one) if aliasOf.contains(one) =>
          bucketShape(aliasOf(one)) match {
            case Some((al, w, c)) =>
              if (bucket.isDefined) refuse("more than one bucket key")
              bucket = Some((one, al, w, c))
            case None => dimAliases += one
          }
        case _ => refuse(s"GROUP BY '${n.parts.mkString(".")}' (name a " +
          "select alias)")
      }
    }
    val (bAlias, bSide, bWidth, bCast) = bucket.getOrElse(refuse(
      "GROUP BY without a bucket(x.ts, '<width>') key"))
    val widthUs = Compiler.parseIntervalMicros(bWidth).getOrElse(refuse(
      s"a calendar bucket width ('$bWidth' — the engine's tumbling " +
        "window needs a fixed width)"))
    if (widthUs <= 0) refuse("a non-positive bucket width")
    val dimSet = dimAliases.result().toSet
    // classify the SELECT; build the joined sub-select (dims + agg
    // args + the bucketing time axis) and the aggregate list
    val subItems = scala.collection.mutable.LinkedHashMap.empty[String, SelectItem]
    sealed trait Out
    case class BucketOut(nm: String) extends Out
    case class DimOut(nm: String) extends Out
    case class AggOut(fn: String, argCol: Option[String], nm: String) extends Out
    val streamingAggs = Set("count", "sum", "avg", "min", "max")
    var helperIdx = 0
    def aggOut(fn: String, arg: Option[Operand], nm: String): AggOut = {
      if (!streamingAggs.contains(fn)) refuse(s"$fn() (streaming-safe " +
        "joined-stream aggregates: count, sum, avg, min, max)")
      arg match {
        case None => AggOut(fn, None, nm)
        case Some(e) =>
          val hn = s"__ja$helperIdx"; helperIdx += 1
          subItems.getOrElseUpdate(hn, ExprItem(e, hn))
          AggOut(fn, Some(hn), nm)
      }
    }
    val outs: Seq[Out] = spec.select.map {
      case ExprItem(e, nm) if nm == bAlias && bucketShape(e).isDefined =>
        BucketOut(nm)
      case ExprItem(OAgg(fn, arg), nm) => aggOut(fn, arg.map(ORef), nm)
      case ExprItem(OAggX(fn, e, ps, a2), nm) =>
        if (ps.nonEmpty || a2.nonEmpty) refuse(s"$fn() with parameters")
        aggOut(fn, Some(e), nm)
      case ExprItem(e, nm) if dimSet.contains(nm) =>
        subItems.getOrElseUpdate(nm, ExprItem(e, nm)); DimOut(nm)
      case _: AggItem => refuse("an unaliased aggregate (agg(x) AS name)")
      case other => refuse(s"select item '$other' (the bucket key, a " +
        "GROUP BY'd dimension alias, or an aliased aggregate)")
    }
    if (!outs.exists(_.isInstanceOf[AggOut]))
      refuse("an aggregate-free select (nothing to roll up)")
    val missingDims = dimSet -- outs.collect { case DimOut(nm) => nm }
    if (missingDims.nonEmpty) refuse(
      s"GROUP BY aliases not in the select: ${missingDims.mkString(", ")}")
    // the bucketing side's time axis rides along; its event-time
    // watermark metadata survives the join + projection, which the
    // downstream window aggregate requires
    val tsName = "__jts"
    // HOT-KEY path first: when the ON decomposes into cross-side equi
    // keys + a finite two-sided interval bound and every select helper
    // sits on one side, the join compiles to the bucketed-probe
    // topology (StreamingOps.bucketedIntervalJoin) — same output
    // multiset, but a hot key's state probe stays bounded by one
    // bound-width time bucket instead of scanning the key's full
    // watermark horizon (measured 80× of uniform for the symmetric
    // plan under one hot user; 1.04× bucketed). Falls back to the
    // symmetric-hash plan when the shape doesn't decompose (mixed-side
    // expressions, non-equi conjuncts, unqualified references).
    val flat = tryBucketedJoinAgg(spec, aliases, wmFam,
        subItems.values.toSeq, tsName, bSide).getOrElse {
      subItems.getOrElseUpdate(tsName,
        ExprItem(ORef(RawName(Seq(bSide, "ts"))), tsName))
      val subSpec = spec.copy(select = subItems.values.toSeq,
        groupBy = Seq.empty, having = None)
      val f = Compiler.compile(subSpec, wmFam)
      sweepJoin(f)
      f
    }
    val keyCols = window(col(tsName), s"$widthUs microseconds") +:
      dimSet.toSeq.sorted.map(col)
    val aggCols = outs.collect { case AggOut(fn, arg, nm) =>
      val c = arg.map(col)
      (fn match {
        case "count" => c.map(count).getOrElse(count(lit(1)))
        case "sum"   => sum(c.get)
        case "avg"   => avg(c.get)
        case "min"   => min(c.get)
        case "max"   => max(c.get)
      }).as(nm)
    }
    val agged = flat.groupBy(keyCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    agged.select(outs.map {
      case BucketOut(nm) =>
        if (bCast) col("window.start").cast("long").as(nm)
        else col("window.start").as(nm)
      case DimOut(nm)       => col(nm)
      case AggOut(_, _, nm) => col(nm)
    }: _*)
  }

  /** The HOT-KEY-PROOF compilation of the joined-stream aggregate:
    * split the joined sub-select per side, compile each side through
    * the ordinary dialect compiler (same pushed-filter scans, same
    * per-source watermark), and join via
    * [[graft.streaming.StreamingOps.bucketedIntervalJoin]] — the
    * time-bucket equi-key decomposition whose state probe is bounded
    * by one bound-width bucket per key however hot one key runs.
    *
    * Engages automatically when the shape decomposes:
    *   - every ON conjunct is a cross-side equality (→ a join key), a
    *     cross-side time-axis comparison (`b.ts <= a.ts + INTERVAL` /
    *     BETWEEN / ts equality → the interval bound), or a single-side
    *     predicate (→ pushed into that side's WHERE — inner-join-safe);
    *   - the accumulated bound is FINITE on both ends (the caller
    *     already refuses half-bounded joins, but e.g. a bound written
    *     against a non-ts axis lands here as non-decomposable);
    *   - at least one non-time equi key exists (the bucket key
    *     composes WITH the key — a pure time join has no hot key to
    *     protect and keeps the symmetric plan);
    *   - every select helper (dim, aggregate argument) and every WHERE
    *     conjunct references exactly one side, alias-qualified.
    *
    * Returns None — symmetric-hash fallback, behavior unchanged — for
    * anything else: mixed-side expressions (`sum(a.x + b.y)`),
    * unqualified references (side-ambiguous in a self-join), non-equi
    * cross-side conjuncts, OR across sides, strict bounds that
    * under/overflow, or a side that compiles to something stateful.
    * Exactness: each left row explodes into its ≤2 covering buckets
    * (array_distinct), the exact time bounds still apply, so every
    * true pair matches exactly once — pinned by the
    * bucketedIntervalJoin batch spec and the shared DuckDB oracle
    * (both topologies hash-match it).
    */
  private def tryBucketedJoinAgg(spec: Ast.QuerySpec, aliases: Seq[String],
      wmFam: ((String, String)) => DataFrame,
      items: Seq[Ast.SelectItem], tsName: String,
      bSide: String): Option[DataFrame] = {
    import graft.boostql.Ast._
    val (aAl, bAl) = (aliases.head, aliases(1))
    // which sides does an expression reference? None = undecidable
    // (a 1/2-part name without an alias head is side-ambiguous here —
    // the two-source resolution belongs to the batch compiler)
    def sidesOfOp(o: Operand): Option[Set[String]] = o match {
      case ORef(RawName(parts)) =>
        if (parts.length >= 2 && aliases.contains(parts.head))
          Some(Set(parts.head))
        else None
      case OLit(_) | OInterval(_) => Some(Set.empty)
      case OArith(_, l, r) =>
        for { a <- sidesOfOp(l); b <- sidesOfOp(r) } yield a ++ b
      case ONeg(x)     => sidesOfOp(x)
      case OCast(x, _) => sidesOfOp(x)
      case OFn(_, args) => args.foldLeft(Option(Set.empty[String])) {
        (acc, e) => for { a <- acc; b <- sidesOfOp(e) } yield a ++ b
      }
      case OCase(bs, el) =>
        val parts = bs.map(br =>
          for { c <- sidesOfB(br._1); v <- sidesOfOp(br._2) } yield c ++ v) ++
          el.map(sidesOfOp)
        parts.foldLeft(Option(Set.empty[String])) {
          (acc, e) => for { a <- acc; b <- e } yield a ++ b
        }
      case _ => None
    }
    def sidesOfB(e: BExpr): Option[Set[String]] = e match {
      case Cmp(_, l, r) =>
        for { a <- sidesOfOp(l); b <- sidesOfOp(r) } yield a ++ b
      case AndE(l, r) =>
        for { a <- sidesOfB(l); b <- sidesOfB(r) } yield a ++ b
      case OrE(l, r) =>
        for { a <- sidesOfB(l); b <- sidesOfB(r) } yield a ++ b
      case NotE(x)       => sidesOfB(x)
      case IsNullE(o, _) => sidesOfOp(o)
      case LikeE(o, _, _) => sidesOfOp(o)
      case InE(o, xs, _) => (o +: xs).foldLeft(Option(Set.empty[String])) {
        (acc, e) => for { a <- acc; b <- sidesOfOp(e) } yield a ++ b
      }
      case BetweenE(o, lo, hi, _) =>
        Seq(o, lo, hi).foldLeft(Option(Set.empty[String])) {
          (acc, e) => for { a <- acc; b <- sidesOfOp(e) } yield a ++ b
        }
      case _ => None
    }
    // ts-axis operand with a constant micros offset: a.ts [± INTERVAL]
    def tsOff(o: Operand): Option[(String, Long)] = o match {
      case ORef(RawName(Seq(al, t)))
        if t.equalsIgnoreCase("ts") && aliases.contains(al) => Some((al, 0L))
      case OArith("+", x, OInterval(s)) => for {
        ao <- tsOff(x); us <- Compiler.parseIntervalMicros(s)
      } yield (ao._1, ao._2 + us)
      case OArith("-", x, OInterval(s)) => for {
        ao <- tsOff(x); us <- Compiler.parseIntervalMicros(s)
      } yield (ao._1, ao._2 - us)
      case OArith("+", i @ OInterval(_), x) => tsOff(OArith("+", x, i))
      case _ => None
    }
    def flip(op: String): String = op match {
      case "<" => ">"; case "<=" => ">="; case ">" => "<"; case ">=" => "<="
      case other => other
    }
    def conjuncts(e: BExpr): Seq[BExpr] = e match {
      case AndE(l, r) => conjuncts(l) ++ conjuncts(r)
      case BetweenE(o, lo, hi, false) =>
        Seq(Cmp(">=", o, lo), Cmp("<=", o, hi))
      case other => Seq(other)
    }
    var lo = Long.MinValue; var hi = Long.MaxValue
    val keys = Vector.newBuilder[(Operand, Operand)] // (A-side, B-side)
    val aWhere = Vector.newBuilder[BExpr]
    val bWhere = Vector.newBuilder[BExpr]
    // a single-side conjunct pushes into that side's WHERE (inner join:
    // filtering before or after the join is the same multiset)
    def pushSide(c: BExpr): Boolean = sidesOfB(c) match {
      case Some(s) if s.subsetOf(Set(aAl)) => aWhere += c; true
      case Some(s) if s == Set(bAl)        => bWhere += c; true
      case _ => false
    }
    val cond = spec.joins.head.on.getOrElse(return None)
    for (c <- conjuncts(cond)) c match {
      case Cmp(op, l, r) if tsOff(l).isDefined && tsOff(r).isDefined &&
          tsOff(l).get._1 != tsOff(r).get._1 =>
        // normalize to δ = ts_B − ts_A: ts_al + ol OP ts_ar + orr
        val (al, ol) = tsOff(l).get
        val (_, orr) = tsOff(r).get
        val (effOp, k) =
          if (al == bAl) (op, orr - ol) else (flip(op), ol - orr)
        effOp match {
          case "<="       => hi = math.min(hi, k)
          case "<"        => if (k == Long.MinValue) return None
                             else hi = math.min(hi, k - 1)
          case ">="       => lo = math.max(lo, k)
          case ">"        => if (k == Long.MaxValue) return None
                             else lo = math.max(lo, k + 1)
          case "=" | "==" => lo = math.max(lo, k); hi = math.min(hi, k)
          case _          => return None
        }
      case c @ Cmp("=" | "==", l, r) =>
        (sidesOfOp(l), sidesOfOp(r)) match {
          case (Some(sl), Some(sr))
            if sl.size == 1 && sr.size == 1 && sl != sr =>
            keys += (if (sl.head == aAl) (l, r) else (r, l))
          case _ => if (!pushSide(c)) return None
        }
      case other => if (!pushSide(other)) return None
    }
    val keyPairs = keys.result()
    if (keyPairs.isEmpty) return None
    if (lo == Long.MinValue || hi == Long.MaxValue || hi < lo) return None
    // split the WHERE the same way
    spec.where.foreach(w =>
      for (c <- conjuncts(w)) if (!pushSide(c)) return None)
    // assign each select helper to its side (side-free → A)
    val aItems = Vector.newBuilder[SelectItem]
    val bItems = Vector.newBuilder[SelectItem]
    items.foreach {
      case it @ ExprItem(e, _) => sidesOfOp(e) match {
        case Some(s) if s.subsetOf(Set(aAl)) => aItems += it
        case Some(s) if s == Set(bAl)        => bItems += it
        case _                               => return None
      }
      case _ => return None
    }
    keyPairs.zipWithIndex.foreach { case ((ae, be), i) =>
      aItems += ExprItem(ae, s"__ek${i}_a")
      bItems += ExprItem(be, s"__ek${i}_b")
    }
    val aTs = if (bSide == aAl) tsName else "__jts_o"
    val bTs = if (bSide == bAl) tsName else "__jts_o"
    aItems += ExprItem(ORef(RawName(Seq(aAl, "ts"))), aTs)
    bItems += ExprItem(ORef(RawName(Seq(bAl, "ts"))), bTs)
    def andAll(cs: Seq[BExpr]): Option[BExpr] = cs.reduceOption(AndE.apply)
    val aSpec = QuerySpec(select = aItems.result(), source = spec.source,
      joins = Seq.empty, where = andAll(aWhere.result()),
      groupBy = Seq.empty, having = None, orderBy = Seq.empty, limit = None)
    val bSpec = QuerySpec(select = bItems.result(),
      source = spec.joins.head.source, joins = Seq.empty,
      where = andAll(bWhere.result()), groupBy = Seq.empty, having = None,
      orderBy = Seq.empty, limit = None)
    // a side that compiles to anything stateful (a multi-series align
    // is itself a join) cannot ride the decomposition — fall back and
    // let the symmetric path's sweep issue its richer refusal
    def stateless(df: DataFrame): Boolean = {
      import org.apache.spark.sql.catalyst.plans.logical
      var ok = true
      df.queryExecution.analyzed.foreach {
        case _: logical.Project | _: logical.Filter |
             _: logical.SubqueryAlias | _: logical.LeafNode |
             _: logical.EventTimeWatermark => ()
        case _ => ok = false
      }
      ok
    }
    try {
      val aDf = Compiler.compile(aSpec, wmFam)
      val bDf = Compiler.compile(bSpec, wmFam)
      if (!stateless(aDf) || !stateless(bDf)) return None
      Some(graft.streaming.StreamingOps.bucketedIntervalJoin(
        aDf, bDf,
        keyPairs.indices.map(i => s"__ek${i}_a" -> s"__ek${i}_b"),
        lo, hi, leftTs = aTs, rightTs = bTs))
    } catch {
      // a per-side compile refusal (an expression form the split spec
      // can't carry) — the joint symmetric compile may still accept it
      case _: Compiler.CompileException => None
    }
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
