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
    // SLIDING windows: each event expands map-side into its
    // window/slide = 2 overlapping windows; the oracle replays the
    // expansion with an explicit 2-row cross join
    "stream_sliding_agg" -> ((s, d) => StreamingOps.slidingWindowReplay(s, d)),
    "stream_dedup_count" -> ((s, d) => StreamingOps.streamingDedupCounts(s, d)),
    "stream_session" -> ((s, d) => StreamingOps.sessionWindowReplay(s, d)),
    "stream_join" -> ((s, d) => StreamingOps.streamIntervalJoinReplay(s, d)),
    "stream_neardup" -> ((s, d) =>
      StreamingOps.streamingShingleCandidates(s, d)),
    // write half (streamIntoFamily) + read half (openStream tail) +
    // windowed agg, end to end — the streaming twin of boost_roundtrip
    "stream_family_roundtrip" -> ((s, d) =>
      StreamingOps.streamFamilyRoundtrip(s, d)),
    // continuous SQL ingest: the batch INSERT text kept running against
    // a live tail, feeding a derived family (stateless transform tier)
    "stream_sql_insert" -> ((s, d) =>
      StreamingOps.streamSqlInsertReplay(s, d)),
    // the dialect's SLIDING bucket over a stream: bucket(ts, w, slide)
    // through sqlStream compiles to window(ts, w, slide)
    "stream_sql_sliding" -> ((s, d) =>
      StreamingOps.streamSqlSlidingReplay(s, d)),
    // the DIALECT over a stream: BoostQL.sqlStream compiles the same
    // grammar against an openStream tail (stateless subset), appended
    // through AvailableNow — must equal the batch run of the same query
    "stream_sql_filter" -> ((s, d) =>
      StreamingOps.streamSqlFilterReplay(s, d)),
    // the STATEFUL dialect subset: watermarked bucket()-keyed GROUP BY
    // compiled to a true event-time window aggregation over the tail
    "stream_sql_window" -> ((s, d) =>
      StreamingOps.streamSqlWindowReplay(s, d)),
    // continuous heavy hitters: the mergeable Misra-Gries summary as
    // bounded streaming-aggregation state per (window, series); exact
    // below capacity, so the replay equals the batch count+rank
    "stream_top_k" -> ((s, d) => StreamingOps.streamingTopK(s, d)),
    // the same capability through the SQL FRONT: approx_top_k(x, k)
    // inside sqlStream's watermarked bucket()-keyed aggregate
    "stream_sql_topk" -> ((s, d) => StreamingOps.streamSqlTopKReplay(s, d)),
    // HAVING over the watermarked streaming aggregate — a stateless
    // filter on finalized windows, incl. a hidden max() aggregate
    "stream_sql_having" -> ((s, d) =>
      StreamingOps.streamSqlHavingReplay(s, d)),
    // continuous per-window DISTRIBUTIONS: histogram() as watermarked
    // streaming-aggregation state (nbins plain sums — constant per
    // window entry), the same portable count string as batch
    "stream_sql_hist" -> ((s, d) => StreamingOps.streamSqlHistReplay(s, d)),
    // continuous DRIFT DETECTION: the corr/regr desugar trees as
    // streaming aggregate expressions — pair sums are ordinary
    // watermarked state, the OLS/corr tail applies statelessly to
    // finalized windows
    "stream_sql_regr" -> ((s, d) => StreamingOps.streamSqlRegrReplay(s, d)),
    // stream-stream JOIN through the SQL front: the dialect's interval-
    // bounded two-family equi-join compiled to a watermarked streaming
    // inner join (state bounded by watermark + the ON's time bound)
    "stream_sql_join" -> ((s, d) => StreamingOps.streamSqlJoinReplay(s, d)),
    // SESSION windows through the SQL front: GROUP BY session(ts, gap)
    // compiled to session_window — open per-user sessions as
    // watermark-finalized state, the continuous form of the batch
    // dialect's session() window function
    "stream_sql_session" -> ((s, d) =>
      StreamingOps.streamSqlSessionReplay(s, d)),
    // streaming LEFT OUTER join through the SQL front: unmatched
    // clicks emit null-extended at watermark passage (flush rows close
    // the books so the replay's tail actually emits)
    "stream_sql_left_join" -> ((s, d) =>
      StreamingOps.streamSqlLeftJoinReplay(s, d)),
    // windowed aggregation OVER the joined stream (chained stateful
    // operators, append mode): the enrich-then-rollup pipeline
    "stream_sql_join_agg" -> ((s, d) =>
      StreamingOps.streamSqlJoinAggReplay(s, d)),
    // FULL OUTER stream-stream join: both sides null-extend at
    // watermark passage (the LEFT form's mirror plus the union)
    "stream_sql_full_join" -> ((s, d) =>
      StreamingOps.streamSqlFullJoinReplay(s, d)),
    // continuous materialization OVER the joined stream: the
    // enrich-then-rollup pipeline piped into a derived family through
    // sqlStreamInsert (dimension keys land as per-point attributes),
    // read back with batch dialect queries
    "stream_sql_join_insert" -> ((s, d) =>
      StreamingOps.streamSqlJoinInsertReplay(s, d)),
    // continuous SESSION materialization: session-window aggregate →
    // derived family keyed by session start, user as attribute
    "stream_sql_session_insert" -> ((s, d) =>
      StreamingOps.streamSqlSessionInsertReplay(s, d)),
    // the HOT-KEY-PROOF joined-stream rollup: bucketedIntervalJoin
    // (time-bucket equi key + ≤2-bucket explode) bounds state probes
    // per (user, hour-bucket); same output contract as
    // stream_sql_join_agg, same oracle
    "stream_join_agg_bucketed" -> ((s, d) =>
      StreamingOps.streamJoinAggBucketedReplay(s, d)),
    // stream-STATIC enrichment: the event stream broadcast-joined to the
    // customer dimension (no join state, no watermark — the static side
    // replans into each micro-batch), rolled up per (segment, type)
    "stream_static_join" -> ((s, d) =>
      StreamingOps.streamStaticJoinReplay(s, d)),
    // continuous MERGE: per-micro-batch UPSERT through foreachBatch —
    // the SAME stream delivered TWICE (worst-case restart replay) lands
    // a family equal to the batch source, never doubled
    "stream_upsert" -> ((s, d) => StreamingOps.streamUpsertReplay(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    // a double delivery through the merge sink equals the source once:
    // re-delivery replaced, never duplicated
    "stream_upsert" ->
      """SELECT event_type AS series, ts, value,
        |  CAST(user_id AS VARCHAR) AS user
        |FROM events ORDER BY series, ts""".stripMargin,

    // streaming/batch parity for the stream-static enrich + rollup
    "stream_static_join" ->
      """SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin,

    "stream_window_agg" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS w_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin,

    // the streamed INSERT pipe adds and loses nothing: read-back of the
    // derived family equals the direct transform (boost_insert_roundtrip
    // run through the streaming write path)
    "stream_sql_insert" ->
      """SELECT value AS p, value * 2.0 AS p2, ts
        |FROM events WHERE event_type = 'purchase' AND value > 250.0
        |ORDER BY ts""".stripMargin,

    // window(ts, 1d, 12h) starts as epoch seconds after the dialect's
    // CAST AS int; same 2-row expansion, filtered like the query
    "stream_sql_sliding" ->
      """WITH j AS (
        |  SELECT value,
        |    epoch(time_bucket(INTERVAL '12 hours', ts)) - x.o * 43200 AS d
        |  FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS o) AS x
        |  WHERE event_type = 'view' AND value > 50.0)
        |SELECT CAST(d AS BIGINT) AS d, COUNT(*) AS n,
        |  CAST(SUM(CAST(TRUNC(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |FROM j GROUP BY 1 ORDER BY d""".stripMargin,

    // every event is in exactly 2 sliding windows (ts ∈ [b, b+12h) ⟹
    // both window starts b and b−12h cover it); the 2-row cross join is
    // the batch replay of the engine's map-side Expand
    "stream_sliding_agg" ->
      """WITH j AS (
        |  SELECT event_type, value,
        |    epoch_us(time_bucket(INTERVAL '12 hours', ts))
        |      - x.o * 43200000000 AS w_start_us
        |  FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS o) AS x)
        |SELECT w_start_us, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM j GROUP BY 1, 2 ORDER BY w_start_us, event_type""".stripMargin,

    "stream_dedup_count" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // the SQL-front streamed top-k: per-day counts over click rows,
    // ranked (n DESC, item ASC), top 16 as the same "item:n,…"; n
    // counts the bucket's click rows (the dialect frame is the
    // referenced series)
    "stream_sql_topk" ->
      """WITH c AS (
        |  SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS d,
        |    props->>'k' AS item, COUNT(*) AS n
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |), t AS (
        |  SELECT d, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY d
        |), r AS (
        |  SELECT d, item, n,
        |    row_number() OVER (PARTITION BY d ORDER BY n DESC, item) AS rk
        |  FROM c)
        |SELECT r.d AS d,
        |  string_agg(r.item || ':' || r.n, ',' ORDER BY r.rk) AS top,
        |  any_value(t.total) AS n
        |FROM r JOIN t USING (d) WHERE r.rk <= 16
        |GROUP BY r.d ORDER BY d""".stripMargin,

    // exact-regime replay of the streamed MG summary: per (day, type)
    // counts ranked (n DESC, item ASC), top 16 as the same "item:n,…"
    "stream_top_k" ->
      """WITH c AS (
        |  SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS w_start_us,
        |    event_type, props->>'k' AS item, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2, 3
        |), r AS (
        |  SELECT w_start_us, event_type, item, n,
        |    row_number() OVER (PARTITION BY w_start_us, event_type
        |      ORDER BY n DESC, item) AS rk
        |  FROM c)
        |SELECT w_start_us, event_type,
        |  string_agg(item || ':' || n, ',' ORDER BY rk) AS top
        |FROM r WHERE rk <= 16 GROUP BY w_start_us, event_type
        |ORDER BY w_start_us, event_type""".stripMargin,

    // the family roundtrip must reproduce the plain batch aggregate —
    // the parquet write/stream-read hop adds no rows, loses no rows
    "stream_family_roundtrip" ->
      """SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS w_start_us,
        |  event_type AS series, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY w_start_us, series""".stripMargin,

    // the streamed dialect filter must equal the batch filter — the
    // parquet hop and micro-batch replay add and lose nothing
    "stream_sql_filter" ->
      """SELECT CAST(event_id AS VARCHAR) AS purchase_event_id,
        |  CAST(user_id AS VARCHAR) AS purchase_user, value AS purchase
        |FROM events WHERE event_type = 'purchase' AND value > 250.0
        |ORDER BY purchase_event_id""".stripMargin,

    // the streamed dialect aggregate must equal the same query run
    // batch: daily event-time windows (epoch-aligned like bucket()),
    // exact integer-cents sums
    "stream_sql_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS d,
        |  CAST(user_id AS VARCHAR) AS u, COUNT(*) AS n,
        |  CAST(SUM(CAST(TRUNC(value * 100.0) AS BIGINT)) AS BIGINT) AS cents,
        |  MIN(value) AS lo, MAX(value) AS hi
        |FROM events WHERE event_type = 'purchase' AND value > 50.0
        |GROUP BY 1, 2 ORDER BY d, u""".stripMargin,

    // the streamed OLS/corr must equal the batch desugar exactly: the
    // same exact pair sums per daily window, the same fixed IEEE tail
    "stream_sql_regr" ->
      """WITH t AS (
        |  SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS d,
        |    CAST(user_id AS VARCHAR) AS u,
        |    CAST(event_id AS BIGINT) AS x,
        |    CAST(TRUNC(value * 100.0) AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase' AND value > 50.0
        |), g AS (
        |  SELECT d, u,
        |    CAST(SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |                  THEN 1 END) AS DOUBLE) AS nd,
        |    CAST(SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |                  THEN x END) AS DOUBLE) AS sx,
        |    CAST(SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |                  THEN y END) AS DOUBLE) AS sy,
        |    CAST(SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |                  THEN x * x END) AS DOUBLE) AS sxx,
        |    CAST(SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |                  THEN y * y END) AS DOUBLE) AS syy,
        |    CAST(SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL
        |                  THEN x * y END) AS DOUBLE) AS sxy,
        |    COUNT(*) AS n
        |  FROM t GROUP BY d, u)
        |SELECT d, u,
        |  CASE WHEN nd * sxx - sx * sx > 0
        |    THEN (nd * sxy - sx * sy) / (nd * sxx - sx * sx) END AS sl,
        |  CASE WHEN sqrt(nd * sxx - sx * sx) > 0
        |        AND sqrt(nd * syy - sy * sy) > 0
        |    THEN ((nd * sxy - sx * sy) / sqrt(nd * sxx - sx * sx))
        |           / sqrt(nd * syy - sy * sy) END AS r,
        |  n
        |FROM g ORDER BY d, u""".stripMargin,

    // the streamed histogram must equal the batch bins exactly: same
    // bin arithmetic, same comma-joined rendering, per daily window
    "stream_sql_hist" ->
      """WITH t AS (
        |  SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS d,
        |    CAST(TRUNC(value * 100.0) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase'
        |), b AS (
        |  SELECT d, x,
        |    CASE WHEN x IS NOT NULL AND CAST(x AS DOUBLE) >= 0.0
        |              AND CAST(x AS DOUBLE) < 25000.0
        |         THEN least(CAST(floor((CAST(x AS DOUBLE) - 0.0)
        |                    / 25000.0 * 8.0) AS INT), 7) END AS bin
        |  FROM t)
        |SELECT d,
        |  concat_ws(',',
        |    COALESCE(SUM(CASE WHEN bin = 0 THEN 1 END), 0),
        |    COALESCE(SUM(CASE WHEN bin = 1 THEN 1 END), 0),
        |    COALESCE(SUM(CASE WHEN bin = 2 THEN 1 END), 0),
        |    COALESCE(SUM(CASE WHEN bin = 3 THEN 1 END), 0),
        |    COALESCE(SUM(CASE WHEN bin = 4 THEN 1 END), 0),
        |    COALESCE(SUM(CASE WHEN bin = 5 THEN 1 END), 0),
        |    COALESCE(SUM(CASE WHEN bin = 6 THEN 1 END), 0),
        |    COALESCE(SUM(CASE WHEN bin = 7 THEN 1 END), 0)) AS h,
        |  COUNT(*) AS n
        |FROM b GROUP BY d ORDER BY d""".stripMargin,

    // HAVING applies after the windows finalize — the batch replay is
    // the same aggregation with the same HAVING (the hidden max(value)
    // filters but is not output)
    "stream_sql_having" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS d,
        |  CAST(user_id AS VARCHAR) AS u, COUNT(*) AS n,
        |  CAST(SUM(CAST(TRUNC(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |FROM events WHERE event_type = 'purchase' AND value > 50.0
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2 AND max(value) < 370.0
        |ORDER BY d, u""".stripMargin,

    // batch twin of session_window: gaps-and-islands with the same 6h
    // gap; session end is last-event + gap, matching Spark's contract
    "stream_session" ->
      """WITH e AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM e)
        |SELECT user_id, MIN(epoch_us(ts)) AS w_start_us,
        |  MAX(epoch_us(ts)) + 21600000000 AS w_end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, w_start_us""".stripMargin,

    // batch twin of the SQL-front session aggregate: gaps-and-islands
    // over click rows with the same 6h gap; session start = first
    // event ts on both sides (strict-> break matches the engine's
    // exclusive session end; micros-exact gap ties are absent in the
    // corpus — same convention stream_session pins)
    "stream_sql_session" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS u, ts,
        |    CAST(TRUNC(value * 100.0) AS BIGINT) AS c,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events WHERE event_type = 'click'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT u, ts, c,
        |    SUM(brk) OVER (PARTITION BY u ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM e)
        |SELECT MIN(ts) AS w, u, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS cents
        |FROM s GROUP BY u, sid ORDER BY u, w""".stripMargin,

    // batch twin of the stream-stream interval join (bounds on µs-
    // truncated timestamps, matching the Spark side's `ts div 1000`)
    "stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) >= epoch_us(c.ts)
        |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
        |ORDER BY click_id, purchase_id""".stripMargin,

    // batch twin of the SQL-front streaming LEFT OUTER join: same
    // series restriction per side (subqueries — ON-clause filters on a
    // LEFT side would not restrict its rows), same inclusive time
    // bound; unmatched clicks null-extend
    "stream_sql_left_join" ->
      """SELECT CAST(c.event_id AS VARCHAR) AS click_id,
        |  CAST(c.user_id AS VARCHAR) AS u,
        |  CAST(p.event_id AS VARCHAR) AS purchase_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON CAST(c.user_id AS VARCHAR) = CAST(p.user_id AS VARCHAR)
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id NULLS FIRST""".stripMargin,

    // batch twin of the SQL-front streaming FULL OUTER join: both
    // sides as series-restricted subqueries, both keys selected so
    // null-extension is visible per side
    "stream_sql_full_join" ->
      """SELECT CAST(c.event_id AS VARCHAR) AS click_id,
        |  CAST(c.user_id AS VARCHAR) AS u,
        |  CAST(p.event_id AS VARCHAR) AS purchase_id,
        |  CAST(p.user_id AS VARCHAR) AS pu
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON CAST(c.user_id AS VARCHAR) = CAST(p.user_id AS VARCHAR)
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id NULLS FIRST, purchase_id NULLS FIRST""".stripMargin,

    // the bucketed hot-key path computes the SAME rollup — one oracle
    // text, two topologies (raw symmetric-hash vs bucketed-probe join)
    "stream_join_agg_bucketed" ->
      """WITH j AS (
        |  SELECT c.ts AS cts, CAST(c.user_id AS VARCHAR) AS u,
        |    p.value AS pv
        |  FROM events c JOIN events p
        |    ON c.event_type = 'click' AND p.event_type = 'purchase'
        |    AND CAST(c.user_id AS VARCHAR) = CAST(p.user_id AS VARCHAR)
        |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
        |SELECT CAST(epoch(time_bucket(INTERVAL '1 day', cts)) AS BIGINT) AS d,
        |  u, COUNT(*) AS n,
        |  CAST(SUM(CAST(TRUNC(pv * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |FROM j GROUP BY 1, 2 ORDER BY d, u""".stripMargin,

    // batch twin of the joined-stream rollup: the same interval join,
    // then per-(day-of-click, user) counts and exact integer-cents sums
    "stream_sql_join_agg" ->
      """WITH j AS (
        |  SELECT c.ts AS cts, CAST(c.user_id AS VARCHAR) AS u,
        |    p.value AS pv
        |  FROM events c JOIN events p
        |    ON c.event_type = 'click' AND p.event_type = 'purchase'
        |    AND CAST(c.user_id AS VARCHAR) = CAST(p.user_id AS VARCHAR)
        |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
        |SELECT CAST(epoch(time_bucket(INTERVAL '1 day', cts)) AS BIGINT) AS d,
        |  u, COUNT(*) AS n,
        |  CAST(SUM(CAST(TRUNC(pv * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |FROM j GROUP BY 1, 2 ORDER BY d, u""".stripMargin,

    // batch twin of the joined-stream CONTINUOUS MATERIALIZATION: the
    // same join+rollup as stream_sql_join_agg, then unpivoted to the
    // family long layout the INSERT wrote (one row per (rollup series,
    // session key, user), value as double — the family value type)
    "stream_sql_join_insert" ->
      """WITH j AS (
        |  SELECT time_bucket(INTERVAL '1 day', c.ts) AS d,
        |    CAST(c.user_id AS VARCHAR) AS u, COUNT(*) AS n,
        |    SUM(CAST(TRUNC(p.value * 100.0) AS BIGINT)) AS cents
        |  FROM events c JOIN events p
        |    ON c.event_type = 'click' AND p.event_type = 'purchase'
        |    AND CAST(c.user_id AS VARCHAR) = CAST(p.user_id AS VARCHAR)
        |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |  GROUP BY 1, 2)
        |SELECT ts, u, v FROM (
        |  SELECT d AS ts, u, CAST(n AS DOUBLE) AS v FROM j
        |  UNION ALL
        |  SELECT d AS ts, u, CAST(cents AS DOUBLE) AS v FROM j) t
        |ORDER BY ts, u, v""".stripMargin,

    // batch twin of the session CONTINUOUS MATERIALIZATION: the
    // gaps-and-islands sessionization (same as stream_sql_session),
    // keyed by session start, unpivoted to the family long layout
    "stream_sql_session_insert" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS u, ts,
        |    CAST(TRUNC(value * 100.0) AS BIGINT) AS c,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events WHERE event_type = 'click'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT u, ts, c,
        |    SUM(brk) OVER (PARTITION BY u ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM e),
        |g AS (SELECT MIN(ts) AS w, u, COUNT(*) AS n, SUM(c) AS cents
        |  FROM s GROUP BY u, sid)
        |SELECT ts, u, v FROM (
        |  SELECT w AS ts, u, CAST(n AS DOUBLE) AS v FROM g
        |  UNION ALL
        |  SELECT w AS ts, u, CAST(cents AS DOUBLE) AS v FROM g) t
        |ORDER BY ts, u, v""".stripMargin,

    // batch twin of the SQL-front stream-stream join: same equi key
    // (user as VARCHAR, the dialect's attribute type), same inclusive
    // micros-exact time bound
    "stream_sql_join" ->
      """SELECT CAST(c.event_id AS VARCHAR) AS click_id,
        |  CAST(c.user_id AS VARCHAR) AS u,
        |  CAST(p.event_id AS VARCHAR) AS purchase_id
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND CAST(c.user_id AS VARCHAR) = CAST(p.user_id AS VARCHAR)
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin,

    // batch twin of the streaming shingle-candidate rollup: identical
    // word-3-gram extraction (1-based inclusive slices, per-doc
    // distinct), then pure integer counts
    "stream_neardup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([array_to_string(l[i:i+2], ' ')
        |                 for i in generate_series(1, greatest(len(l)-2, 1))]) AS s
        |FROM t),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |gc AS (SELECT g, COUNT(*) AS n FROM ex GROUP BY g)
        |SELECT COUNT(*) AS n_shingles,
        |  CAST(COUNT(*) FILTER (n >= 2) AS BIGINT) AS cand_shingles,
        |  CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS cand_pairs
        |FROM gc""".stripMargin
  )
}
