package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** The relational operator tier — everything the reference parsed or
  * declared but never executed (SURVEY.md §2.3 joins J1/J2, §2.4
  * aggregations A1-A3, §2.5 sorts/limits/set-ops/scalar fns), expressed
  * as stock DataFrame plans so Catalyst owns join strategy, pushdown and
  * codegen.
  *
  * Oracle-determinism conventions (see SparkEntry scaladoc): double
  * SUMs go through an exact DECIMAL accumulation then cast back to
  * double; AVG is decimal-sum / count; every query is totally ordered.
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q2_join_agg" -> ((s, d) => {
      // small dim side broadcast: no shuffle of the fact table at scale
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_total"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    "q5_multijoin" -> ((s, d) => {
      // TPC-H Q5-flavored: 5-table join, dims broadcast, one agg shuffle
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,8)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q4_having" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")),

    "q_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    "q_distinct" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"))
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")),

    "q_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")),

    "q_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    "q_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    "q_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    "q_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy("c_custkey")
    }),

    "q_window_rank" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_mktsegment", "rn")
    }),

    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    "q_scalar_fns" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 12).as("name12"),
        length(col("p_type")).as("type_len"),
        concat(col("p_brand"), lit("_"), col("p_type")).as("brand_type"),
        round(col("p_retailprice") * 0.1, 2).as("tithe"),
        sqrt(col("p_retailprice")).as("sqrt_price"))
        .orderBy("p_partkey")),

    "q_datetime_fns" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        to_date(col("o_orderdate")).as("od"))
        .orderBy("o_orderkey")),

    "q_case_when" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("tier",
          when(col("o_totalprice") > 300000.0, "high")
            .when(col("o_totalprice") > 150000.0, "mid")
            .otherwise("low"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"))
        .orderBy("tier")),

    "q_filter_mixed" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 25 && col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    // pivot with EXPLICIT value list: no driver-side distinct scan to
    // discover columns (the implicit form's hidden collect — a scale
    // anti-pattern); one partial-agg shuffle, same plan as a groupBy
    "q_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("o_orderpriority")),

    // portable KMV bottom-k distinct sketch: estimates hash-match the
    // DuckDB oracle running the same md5 arithmetic (SketchOps)
    "q_kmv_distinct" -> ((s, d) =>
      graft.operators.SketchOps.kmvDistinct(
          Tables.lineitem(s, d), "l_returnflag", "l_partkey", 64)
        .orderBy("l_returnflag")),

    // portable sampled-quantile sketch: the k rows with smallest
    // md5(id) hashes are a deterministic uniform sample; the exact
    // interpolated median of the sample replays in DuckDB — the
    // cross-engine-checkable counterpart of the GK tier below
    "q_sampled_quantile" -> ((s, d) =>
      graft.operators.SketchOps.sampledPercentile(
          Tables.events(s, d), "event_type", "value", "event_id", 0.5, 256)
        .orderBy("event_type")),

    // native DataSketches HLL estimates, ORACLE-CHECKED BY INVARIANT:
    // the sketch bytes are engine-specific, but the accuracy contract
    // is not — emit the EXACT distinct count (DuckDB-replayable) plus a
    // boolean pinning the estimate within ±5% of it (lgK=12 ⇒ ~1.6%
    // relative std error; 3σ ≈ 4.9%). DuckDB predicts TRUE literally,
    // so the hash matches iff the estimate actually lands in the bound
    // — the reference's own self-verifying harness style
    // (examples/basic_client/main.go:229-245). Raw estimates +
    // mergeability stay pinned in SketchOpsSpec.
    "q_hll_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val est = graft.operators.SketchOps.hllDistinct(
        li, "l_returnflag", "l_partkey")
      li.groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")).as("exact_distinct"))
        .join(broadcast(est), "l_returnflag")
        .select(col("l_returnflag"), col("exact_distinct"),
          (abs(col("est_distinct") / col("exact_distinct") - 1.0) <= 0.05)
            .as("within_5pct"))
        .orderBy("l_returnflag")
    }),

    // Greenwald–Khanna approximate quantiles, ORACLE-CHECKED BY
    // INVARIANT: GK picks in-group ELEMENTS (engine-specific choice),
    // but its deterministic guarantee — returned element's rank within
    // n/accuracy of target — is checkable: join the estimates back and
    // count elements strictly-below / at-or-below each one; the
    // element's rank interval [lt+1, le] must overlap [p·n − εn,
    // p·n + εn] (ε = 2/accuracy, twice the hard bound for float slack).
    // DuckDB predicts TRUE per prob + the exact n, so a rank-bound
    // violation is a hash mismatch. Element choice stays pinned in
    // SketchOpsSpec.
    "q_quantile_sketch" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val probs = Seq(0.25, 0.5, 0.9, 0.99)
      // Verified in ONE aggregation pass (one scan, one sketch-sized
      // exchange — the r14 form joined the estimates back and re-
      // scanned lineitem to count ranks, doubling the query's cost):
      // alongside the GK sketch, the SAME groupBy computes the exact
      // percentile at p ± ε (ε = 2/accuracy, twice GK's hard rank
      // bound of n/accuracy, the extra factor absorbing interpolation
      // at the bound ranks). Value is nondecreasing in rank, so a GK
      // element within its rank guarantee necessarily lies within
      // [exact(p−ε), exact(p+ε)] — a value-level rendering of the
      // same accuracy contract, checkable without a second pass.
      // Both aggregates partial-merge (GK summaries / per-partition
      // count maps), so the exchange stays sketch-sized at any scale.
      val eps = 2.0 / 1000.0
      val loHi = probs.flatMap(p =>
        Seq(math.max(0.0, p - eps), math.min(1.0, p + eps)))
      val q = li.groupBy(col("l_returnflag")).agg(
        percentile_approx(col("l_extendedprice"),
          array(probs.map(lit): _*), lit(1000)).as("quantiles"),
        count(col("l_extendedprice")).as("n"),
        expr(s"percentile(l_extendedprice, array(${loHi.mkString(",")}))")
          .as("bounds"))
      val oks = probs.zipWithIndex.map { case (p, i) =>
        (col("quantiles")(i) >= col("bounds")(2 * i) &&
          col("quantiles")(i) <= col("bounds")(2 * i + 1))
          .as(s"ok_p${(p * 100).toInt}")
      }
      q.select(col("l_returnflag") +: col("n") +: oks: _*)
        .orderBy("l_returnflag")
    }),

    // bivariate aggregates: corr / sample covariance / sample stddev.
    // Both engines use single-pass co-moment accumulation; results are
    // rounded to pin the (tiny) last-bit divergence out of the hash
    "q_corr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"))
  )

  def oracleSql: Map[String, String] = Map(
    "q2_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q4_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |GROUP BY o_custkey HAVING COUNT(*) >= 12 ORDER BY o_custkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_rank" ->
      """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_scalar_fns" ->
      """SELECT p_partkey,
        |  UPPER(p_brand) AS brand_u,
        |  SUBSTR(p_name, 1, 12) AS name12,
        |  CAST(LENGTH(p_type) AS INT) AS type_len,
        |  p_brand || '_' || p_type AS brand_type,
        |  ROUND(p_retailprice * 0.1, 2) AS tithe,
        |  SQRT(p_retailprice) AS sqrt_price
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_datetime_fns" ->
      """SELECT o_orderkey,
        |  YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
        |  DAYOFMONTH(o_orderdate) AS dom, QUARTER(o_orderdate) AS q,
        |  CAST(o_orderdate AS DATE) AS od
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'high'
        |            WHEN o_totalprice > 150000.0 THEN 'mid'
        |            ELSE 'low' END AS tier,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY tier""".stripMargin,

    "q_filter_mixed" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 25 AND l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::UBIGINT AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |  FROM h)
        |SELECT l_returnflag, count(*) AS n_seen, CAST(max(h) AS BIGINT) AS kth,
        |  CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
        |       ELSE 63e0 * 4294967296e0 / max(h)::DOUBLE END AS est_distinct
        |FROM r WHERE rn <= 64 GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // sampled-quantile replay: same md5 ranking, same k, same
    // interpolation op order, rounded to 6 decimals
    "q_sampled_quantile" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::UBIGINT ASC) AS rk
        |  FROM events WHERE value IS NOT NULL),
        |arr AS (
        |  SELECT event_type, list_sort(list(value)) AS vals, count(*) AS n
        |  FROM ranked WHERE rk <= 256 GROUP BY 1)
        |SELECT event_type, n::BIGINT AS n_sample,
        |  round(vals[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1] +
        |    (vals[least(CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n)] -
        |     vals[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]) *
        |    (0.5 * (n - 1) - floor(0.5 * (n - 1))), 6) AS p50
        |FROM arr ORDER BY event_type""".stripMargin,

    // invariant oracles: DuckDB computes the exact side and predicts
    // TRUE for each bound check — a sketch estimate outside its
    // accuracy contract is a hash mismatch
    "q_hll_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_distinct,
        |  TRUE AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_quantile_sketch" ->
      """SELECT l_returnflag, COUNT(l_extendedprice) AS n,
        |  TRUE AS ok_p25, TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS r,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
