package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{CorpusOps, GraphOps, SemanticDedupOps, TextAnalysisOps,
  TextDedupOps, VectorSearchOps}
import graft.tables.Tables

/** LLM-training-data-pipeline tier: deduplication (exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine), similarity search
  * (brute-force + LSH ANN), and text analysis (token stats, quality,
  * language-ID, fingerprinting) over the `documents` and `embeddings`
  * tables. No reference analogue — pure extension tier from the brief.
  *
  * Oracle notes: the LSH/SimHash paths are approximate in general, but
  * on this corpus the similarity distribution is bimodal (all non-dup
  * pairs < 0.1 Jaccard, planted near-dups > 0.9 — measured at sf0.01
  * and sf0.001), so candidate-generation recall is 1 - 1e-15 and the
  * verified output equals the exact-Jaccard pair set the DuckDB oracle
  * computes. The approximate kernels are nevertheless DETERMINISTIC
  * arithmetic, so every ANN variant carries a full oracle:
  * `txt_fingerprint` and `ann_lsh` replay the u64 hash chains
  * ([[U64Sql]]), `ann_ivf`/`ann_pq` replay the md5-sampled quantizers,
  * and all float accumulations are explicit left folds (`list_reduce`)
  * matching the kernels' loop order. Recall floors are additionally
  * asserted in PipelineSpec.
  */
object PipelineQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def embs(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  /** Pruned doc-id column fanned out for per-row CODEC work (the mm_*
    * tier): the downstream map synthesizes and decodes real PNG/WAV/MP4
    * payloads per id, and the one-row-group fixture scan would run ALL
    * of that on a single task. Shuffling just the 8-byte ids — never
    * payloads (guide §8's rule: move decisions on proxies, payload
    * bytes once) — costs almost nothing and parallelizes the codec
    * tier; a multi-split production scan already exceeds the session
    * parallelism and takes no exchange. (A previous experiment fanning
    * the WHOLE docs table regressed every pruned read 1.4-3.3x — the
    * guard plus id-only projection is what makes this one safe.)
    */
  private def docIds(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    val ids = Tables.documents(s, d).select(col("doc_id"))
    val p = s.sparkContext.defaultParallelism
    (if (ids.rdd.getNumPartitions < p) ids.repartition(p) else ids).as[Long]
  }

  /** DuckDB fragment: distinct word-3-gram shingles per doc — must stay
    * semantically identical to [[TextDedupOps.shingles]](k=3). */
  private val shingleCte =
    """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS l FROM documents),
      |sh AS (SELECT doc_id, n_chars,
      |  list_distinct([array_to_string(l[i:i+2], ' ')
      |                 for i in generate_series(1, greatest(len(l)-2, 1))]) AS s
      |FROM t)""".stripMargin

  private val jaccardExpr =
    "len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s)))"

  /** DuckDB fragment: near-dup components via min-label propagation as a
    * recursive CTE — the oracle twin of [[GraphOps.connectedComponents]]
    * over the exact-Jaccard pair set. `reach` saturates to every
    * (node, reachable-label) pair; min(lbl) per node is the component
    * minimum, exactly the Spark side's label.
    */
  private val componentCte =
    s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE $jaccardExpr >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
       |comp AS (SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id)""".stripMargin

  /** DuckDB fragment: per-node degree + triangle counts over the exact
    * near-dup pair graph — the oracle twin of [[GraphOps.triangleStats]].
    * Triangles are enumerated once each as x < y < z via the canonical
    * (id_a < id_b) pair list.
    */
  private val triangleCte =
    s"""$shingleCte,
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE $jaccardExpr >= 0.5),
       |deg AS (
       |  SELECT id, count(*) AS degree FROM (
       |    SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs)
       |  GROUP BY id),
       |tri AS (
       |  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
       |  FROM pairs e1
       |  JOIN pairs e2 ON e2.id_a = e1.id_a AND e2.id_b > e1.id_b
       |  JOIN pairs e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b),
       |tcnt AS (
       |  SELECT id, count(*) AS triangles FROM (
       |    SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
       |    UNION ALL SELECT z FROM tri)
       |  GROUP BY id)""".stripMargin

  /** PageRank oracle: the same near-dup `pairs` edge set symmetrized,
    * then the ten power iterations UNROLLED as chained CTEs (standard
    * SQL bars aggregation in a recursive term) — every op the identical
    * integer expression the Spark side compiles (`//` ≡ `div`; all
    * values non-negative so trunc = floor), hence bit-identical.
    */
  private val pageRankOracle: String = {
    val scale = 1000000000000L
    val head = s"""$shingleCte,
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE $jaccardExpr >= 0.5),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT id, $scale // n AS r FROM deg, nn)""".stripMargin
    val iters = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT d.id,
         |    (3 * $scale // 20 // nn.n)
         |      + (17 * coalesce(c.s, 0) // 20) AS r
         |  FROM deg d CROSS JOIN nn
         |  LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(p.r // dg.deg) AS BIGINT) AS s
         |    FROM edges e JOIN r${i - 1} p ON p.id = e.src
         |    JOIN deg dg ON dg.id = e.src
         |    GROUP BY e.dst) c ON c.id = d.id)""".stripMargin
    }.mkString(",\n", ",\n", "")
    head + iters +
      "\nSELECT id AS doc_id, CAST(r AS BIGINT) AS rank_fp FROM r10 " +
      "ORDER BY doc_id"
  }

  /** Demo classifier model for `txt_classify`: deterministic weights in
    * [-1, 1] spread over the 256 hash buckets by a Knuth multiplicative
    * hash, micro-unit quantized (the operator's exactness contract).
    * The oracle VALUES table is generated from the same array, so both
    * engines score with identical integers.
    */
  private val clfWeights: Array[Double] =
    Array.tabulate(256)(i => (((i * 2654435761L + 99991) % 2000001) - 1000000) / 1e6)
  private val clfBias = 0.05

  private def clfLogitExpr =
    s"${dlit(clfBias)} + ((lin.s::DOUBLE / 1000000.0e0) / len(t.l)::DOUBLE)"

  /** Shared CTE prefix: weight table + per-doc integer weight sums. */
  private def clfLinCte: String = {
    val values = clfWeights.zipWithIndex
      .map { case (w, i) => s"('${f"$i%02x"}', ${math.rint(w * 1e6).toLong})" }
      .mkString(", ")
    s"""WITH w(k, wt) AS (VALUES $values),
       |t AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
       |tok AS (SELECT doc_id, unnest(l) AS tk FROM t),
       |lin AS (
       |  SELECT tok.doc_id, sum(w.wt) AS s
       |  FROM tok JOIN w ON w.k = substr(md5(tok.tk), 1, 2)
       |  GROUP BY tok.doc_id)""".stripMargin
  }

  private def clfOracleSql: String =
    s"""$clfLinCte
       |SELECT t.doc_id, len(t.l)::BIGINT AS n_tokens,
       |  $clfLogitExpr AS logit,
       |  ($clfLogitExpr) >= 0.0e0 AS keep
       |FROM t JOIN lin ON lin.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** Batch twin of the streaming curation ledger: same scoring, grouped
    * per (lang, keep) — the streaming replay must match it exactly
    * because the scoring tier is stateless and the ledger agg is
    * order-independent (integer sums).
    */
  private def clfLedgerOracleSql: String =
    s"""$clfLinCte,
       |sc AS (
       |  SELECT t.doc_id, t.lang, len(t.l)::BIGINT AS n_tokens,
       |    ($clfLogitExpr) >= 0.0e0 AS keep
       |  FROM t JOIN lin ON lin.doc_id = t.doc_id)
       |SELECT lang, keep, count(*) AS n_docs, sum(n_tokens)::BIGINT AS sum_tokens
       |FROM sc GROUP BY lang, keep ORDER BY lang, keep""".stripMargin

  /** Calibration sweep parameters (pipe_calibrate): 20 bins over the
    * demo classifier's logit range. */
  private val calBins = 20
  private val calLo = -0.45
  private val calHi = 0.55

  /** DuckDB twin of the calibration sweep: the proven classifier-logit
    * CTE, then the identical bin clamp and running sums. Width/lo
    * literals render through [[dlit]] so both engines bin on identical
    * doubles.
    */
  private def calibrateOracleSql: String = {
    val width = (calHi - calLo) / calBins
    s"""$clfLinCte,
       |sc AS (
       |  SELECT t.doc_id, $clfLogitExpr AS score, d2.n_chars > 250 AS pos
       |  FROM t JOIN lin ON lin.doc_id = t.doc_id
       |  JOIN documents d2 ON d2.doc_id = t.doc_id),
       |pb AS (
       |  SELECT LEAST(${calBins - 1}, GREATEST(0,
       |      CAST(FLOOR((score - ${dlit(calLo)}) / ${dlit(width)}) AS BIGINT))) AS bin,
       |    CAST(pos AS BIGINT) AS p
       |  FROM sc),
       |g AS (SELECT bin, COUNT(*) AS n, SUM(p) AS np FROM pb GROUP BY bin),
       |cum AS (
       |  SELECT bin,
       |    ${dlit(calLo)} + CAST(bin AS DOUBLE) * ${dlit(width)} AS threshold,
       |    CAST(SUM(n) OVER wt AS BIGINT) AS kept,
       |    CAST(SUM(np) OVER wt AS BIGINT) AS tp,
       |    CAST(SUM(np) OVER () AS BIGINT) AS total_pos
       |  FROM g WINDOW wt AS (ORDER BY bin DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT bin, threshold, kept, tp, total_pos,
       |  CAST(tp AS DOUBLE) / CAST(kept AS DOUBLE) AS "precision",
       |  CAST(tp AS DOUBLE) / CAST(total_pos AS DOUBLE) AS recall
       |FROM cum ORDER BY bin""".stripMargin
  }

  /** Unsigned-64-bit arithmetic SQL fragments for the `txt_fingerprint`
    * oracle: DuckDB has no u64 type, so hash values live as HUGEINT in
    * [0, 2^64) with the wrap-around spelled out. `xor` exists only on
    * BIGINT, hence the signed round-trips.
    */
  private object U64Sql {
    val M = "18446744073709551616::HUGEINT" // 2^64
    def u2s(v: String): String =
      s"(CASE WHEN $v >= 9223372036854775808::HUGEINT THEN ($v - $M)::BIGINT ELSE $v::BIGINT END)"
    def s2u(x: String): String =
      s"(CASE WHEN $x < 0 THEN $x::HUGEINT + $M ELSE $x::HUGEINT END)"
    def uxor(a: String, b: String): String = s2u(s"xor(${u2s(a)}, ${u2s(b)})")
    def ushr(v: String, n: Int): String = s"($v // ${1L << n}::HUGEINT)"
    /** `a * b mod 2^64` for a < 2^64 and a CONSTANT b, split into 32-bit
      * halves so no intermediate product overflows INT128. */
    def umul(a: String, b: BigInt): String = {
      val bh = b >> 32
      val bl = b & 0xFFFFFFFFL
      s"((($a * $bl::HUGEINT) % $M + (($a * $bh::HUGEINT) % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M)"
    }
    /** splitmix64 finalizer ([[graft.functions.impl.HashImpl.mix64]]) as
      * a 4-step CTE chain over column `z` of `rel`, keyed by `keys`. */
    def mixCtes(rel: String, keys: Seq[String], prefix: String): String = {
      val k = keys.mkString(", ")
      Seq(
        s"${prefix}1 AS (SELECT $k, (z + 11400714819323198485::HUGEINT) % $M AS z FROM $rel)",
        s"${prefix}2 AS (SELECT $k, ${umul(uxor("z", ushr("z", 30)), BigInt("13787848793156543929"))} AS z FROM ${prefix}1)",
        s"${prefix}3 AS (SELECT $k, ${umul(uxor("z", ushr("z", 27)), BigInt("10723151780598845931"))} AS z FROM ${prefix}2)",
        s"${prefix}4 AS (SELECT $k, ${uxor("z", ushr("z", 31))} AS z FROM ${prefix}3)"
      ).mkString(",\n")
    }
  }

  /** DuckDB replay of `txt_fingerprint` — both graft hash kernels run
    * as exact u64 arithmetic ([[U64Sql]]):
    *
    *  - `fp` ([[graft.functions.impl.HashImpl.rollingFingerprint]],
    *    k = 16): per char-16-gram, the polynomial hash is the power sum
    *    `Σ c_j · P^(15-j) mod 2^64` (what the rolling recurrence
    *    computes), splitmix64-mixed, signed-min per doc.
    *  - `sim` ([[HashImpl.simhashFromHashes]] over
    *    [[HashImpl.shingleHashes]] k = 3): FNV-1a folded per distinct
    *    word-3-gram shingle in a recursive CTE (one char per iteration —
    *    the xor operand is one byte, so it touches only the low 7 bits),
    *    splitmix64-mixed, per-bit majority vote.
    *
    * PRECONDITION: ASCII corpus. The kernels hash UTF-16 units (fp) /
    * UTF-8 bytes (sim); `unicode()` here yields code points, and the
    * three agree exactly on ASCII (pinned in TestdataContractSpec — a
    * corpus drift fails that spec, not this hash compare).
    */
  private def fingerprintOracleSql: String = {
    import U64Sql._
    val M64 = BigInt(1) << 64
    val pows = Iterator.iterate(BigInt(1))(p => (p * 1000003) % M64).take(16).toSeq
    val powsList = pows.map(p => s"$p::HUGEINT").mkString("[", ", ", "]")
    val bitPows = (0 until 64).map(b => s"${BigInt(1) << b}::HUGEINT")
      .mkString("[", ", ", "]")
    val fnvStep = "((h // 128::HUGEINT) * 128::HUGEINT + " +
      "xor((h % 128::HUGEINT)::BIGINT, unicode(substring(s, pos + 1, 1))::BIGINT)::HUGEINT)"
    s"""WITH RECURSIVE
       |cpos AS (
       |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
       |  FROM documents),
       |chars AS (
       |  SELECT doc_id, i, unicode(substring(text, i, 1))::HUGEINT AS c FROM cpos),
       |wpos AS (
       |  SELECT doc_id, length(text) AS n,
       |    unnest(generate_series(0, greatest(length(text) - 16, 0))) AS w
       |  FROM documents),
       |wins AS (SELECT doc_id, w, least(n, 16) AS l FROM wpos),
       |grams AS (
       |  SELECT ch.doc_id, wn.w,
       |    sum(ch.c * $powsList[wn.l + wn.w - ch.i + 1])::HUGEINT % $M AS z
       |  FROM chars ch JOIN wins wn
       |    ON wn.doc_id = ch.doc_id AND ch.i BETWEEN wn.w + 1 AND wn.w + wn.l
       |  GROUP BY ch.doc_id, wn.w),
       |${mixCtes("grams", Seq("doc_id", "w"), "gm")},
       |fp AS (SELECT doc_id, min(${u2s("z")}) AS fp FROM gm4 GROUP BY doc_id),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |shing AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(l[i:i+2], ' ')
       |     for i in generate_series(1, greatest(len(l)-2, 1))])) AS s
       |  FROM toks),
       |sh AS (SELECT doc_id, s, row_number() OVER () AS sid FROM shing),
       |fnv(doc_id, sid, s, pos, h) AS (
       |  SELECT doc_id, sid, s, 0, 14695981039346656037::HUGEINT FROM sh
       |  UNION ALL
       |  SELECT doc_id, sid, s, pos + 1, ${umul(fnvStep, BigInt("1099511628211"))}
       |  FROM fnv WHERE pos < length(s)),
       |shash AS (SELECT doc_id, sid, h AS z FROM fnv WHERE pos = length(s)),
       |${mixCtes("shash", Seq("doc_id", "sid"), "sm")},
       |bits AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN (z // $bitPows[b + 1]) % 2 = 1 THEN 1 ELSE -1 END) AS vote
       |  FROM sm4, (SELECT unnest(generate_series(0, 63)) AS b) AS bt
       |  GROUP BY doc_id, b),
       |sim AS (
       |  SELECT doc_id,
       |    ${u2s(s"(sum(CASE WHEN vote > 0 THEN $bitPows[b + 1] ELSE 0::HUGEINT END) % $M)")} AS sim
       |  FROM bits GROUP BY doc_id)
       |SELECT f.doc_id, f.fp, s.sim
       |FROM fp f JOIN sim s ON s.doc_id = f.doc_id
       |ORDER BY f.doc_id""".stripMargin
  }

  /** Left-fold sum of a DOUBLE list expression — DuckDB's `list_reduce`
    * folds left-to-right, reproducing the kernels' sequential
    * accumulation order (a GROUP BY `sum()` has no order contract, and
    * double addition is not associative). */
  private def lsum(l: String): String =
    s"list_reduce($l, (acc, x) -> acc + x)"

  /** DuckDB replay of `ann_pq` ([[VectorSearchOps.pqTopK]], m=8,
    * ksub=16, k=10, refine=4 over dim-64 vectors): the md5-ordered
    * codebook sample, L2 normalization as `x * (1/sqrt(Σx²))` with the
    * kernel's exact op order, per-subspace argmin-L2 encode (tie →
    * lowest centroid index), query LUT, ADC left-fold, and exact
    * rounded-cosine refine. Every float fold is [[lsum]]-ordered, so
    * the doubles match [[graft.functions.impl.VectorImpl.pqEncode]]/
    * pqLut/pqAdc bit-for-bit.
    */
  private def pqOracleSql: String = {
    val norm = lsum("list_transform(embedding::DOUBLE[], y -> y * y)")
    s"""WITH
       |samp AS (
       |  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR) ASC) AS cix,
       |         embedding::DOUBLE[] AS v
       |  FROM embeddings ORDER BY md5(vec_id::VARCHAR) ASC LIMIT 16),
       |cb AS (
       |  SELECT cix,
       |    list_transform(v, x -> x * (1.0 / sqrt(${lsum("list_transform(v, y -> y * y)")}))) AS cv
       |  FROM samp),
       |corp AS (
       |  SELECT vec_id AS nbr_id, embedding::DOUBLE[] AS rv,
       |    list_transform(embedding::DOUBLE[], x -> x * (1.0 / sqrt($norm))) AS nv
       |  FROM embeddings),
       |enc1 AS (
       |  SELECT c.nbr_id, j.j, b.cix,
       |    ${lsum("list_transform(generate_series(1, 8), t -> (c.nv[(j.j - 1) * 8 + t] - b.cv[(j.j - 1) * 8 + t]) * (c.nv[(j.j - 1) * 8 + t] - b.cv[(j.j - 1) * 8 + t]))")} AS dist
       |  FROM corp c, (SELECT unnest(generate_series(1, 8)) AS j) j, cb b),
       |codes AS (
       |  SELECT nbr_id, list(cix - 1 ORDER BY j) AS code FROM (
       |    SELECT nbr_id, j, cix,
       |      row_number() OVER (PARTITION BY nbr_id, j ORDER BY dist ASC, cix ASC) AS rk
       |    FROM enc1)
       |  WHERE rk = 1 GROUP BY nbr_id),
       |qn AS (
       |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv,
       |    list_transform(embedding::DOUBLE[], x -> x * (1.0 / sqrt($norm))) AS nq
       |  FROM embeddings WHERE vec_id < 5),
       |lut1 AS (
       |  SELECT q.q_id, j.j, b.cix,
       |    ${lsum("list_transform(generate_series(1, 8), t -> q.nq[(j.j - 1) * 8 + t] * b.cv[(j.j - 1) * 8 + t])")} AS lv
       |  FROM qn q, (SELECT unnest(generate_series(1, 8)) AS j) j, cb b),
       |lut AS (SELECT q_id, list(lv ORDER BY j, cix) AS lut FROM lut1 GROUP BY q_id),
       |adc AS (
       |  SELECT l.q_id, c.nbr_id,
       |    ${lsum("list_transform(generate_series(1, 8), j -> l.lut[(j - 1) * 16 + c.code[j] + 1])")} AS adc
       |  FROM codes c CROSS JOIN lut l
       |  WHERE c.nbr_id <> l.q_id),
       |cand AS (
       |  SELECT q_id, nbr_id FROM (
       |    SELECT q_id, nbr_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, nbr_id ASC) AS rk
       |    FROM adc)
       |  WHERE rk <= 40)
       |SELECT q_id, rank, nbr_id, cos FROM (
       |  SELECT ca.q_id, ca.nbr_id,
       |    round(list_cosine_similarity(q.qv, c.rv), 6) AS cos,
       |    row_number() OVER (PARTITION BY ca.q_id
       |      ORDER BY round(list_cosine_similarity(q.qv, c.rv), 6) DESC,
       |               ca.nbr_id ASC) AS rank
       |  FROM cand ca JOIN corp c ON c.nbr_id = ca.nbr_id
       |  JOIN qn q ON q.q_id = ca.q_id)
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB replay of `ann_ivfpq` ([[VectorSearchOps.ivfPqTopK]],
    * nlist=32, nprobe=4, m=8, ksub=16, k=10, refine=4): the coarse
    * tier is `ann_ivf`'s replay verbatim (md5-sampled centroids,
    * argmax-cosine assignment with ties to sample order, top-nprobe
    * probes with ties to lowest centroid id) and the compressed tier
    * is [[pqOracleSql]]'s (md5-sampled codebook, [[lsum]]-ordered
    * encode/LUT/ADC) — with the ADC cross join cut down to the probed
    * (query, list) pairs, which is the whole point of the composite.
    */
  private def ivfPqOracleSql: String = {
    val norm = lsum("list_transform(embedding::DOUBLE[], y -> y * y)")
    s"""WITH
       |cents AS (
       |  SELECT vec_id AS ccid, embedding::DOUBLE[] AS ccv,
       |    row_number() OVER (ORDER BY md5(vec_id::VARCHAR) ASC) AS ord
       |  FROM embeddings ORDER BY md5(vec_id::VARCHAR) ASC LIMIT 32),
       |assigned AS (
       |  SELECT nbr_id, ccid AS cid FROM (
       |    SELECT c.vec_id AS nbr_id, ce.ccid,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], ce.ccv) DESC,
       |                 ce.ord ASC) AS rk
       |    FROM embeddings c CROSS JOIN cents ce)
       |  WHERE rk = 1),
       |samp AS (
       |  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR) ASC) AS cix,
       |         embedding::DOUBLE[] AS v
       |  FROM embeddings ORDER BY md5(vec_id::VARCHAR) ASC LIMIT 16),
       |cb AS (
       |  SELECT cix,
       |    list_transform(v, x -> x * (1.0 / sqrt(${lsum("list_transform(v, y -> y * y)")}))) AS cv
       |  FROM samp),
       |corp AS (
       |  SELECT vec_id AS nbr_id, embedding::DOUBLE[] AS rv,
       |    list_transform(embedding::DOUBLE[], x -> x * (1.0 / sqrt($norm))) AS nv
       |  FROM embeddings),
       |enc1 AS (
       |  SELECT c.nbr_id, j.j, b.cix,
       |    ${lsum("list_transform(generate_series(1, 8), t -> (c.nv[(j.j - 1) * 8 + t] - b.cv[(j.j - 1) * 8 + t]) * (c.nv[(j.j - 1) * 8 + t] - b.cv[(j.j - 1) * 8 + t]))")} AS dist
       |  FROM corp c, (SELECT unnest(generate_series(1, 8)) AS j) j, cb b),
       |codes AS (
       |  SELECT nbr_id, list(cix - 1 ORDER BY j) AS code FROM (
       |    SELECT nbr_id, j, cix,
       |      row_number() OVER (PARTITION BY nbr_id, j ORDER BY dist ASC, cix ASC) AS rk
       |    FROM enc1)
       |  WHERE rk = 1 GROUP BY nbr_id),
       |qn AS (
       |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv,
       |    list_transform(embedding::DOUBLE[], x -> x * (1.0 / sqrt($norm))) AS nq
       |  FROM embeddings WHERE vec_id < 5),
       |probes AS (
       |  SELECT q_id, ccid AS cid FROM (
       |    SELECT q.q_id, ce.ccid,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY list_cosine_similarity(q.qv, ce.ccv) DESC,
       |                 ce.ccid ASC) AS rk
       |    FROM qn q CROSS JOIN cents ce)
       |  WHERE rk <= 4),
       |lut1 AS (
       |  SELECT q.q_id, j.j, b.cix,
       |    ${lsum("list_transform(generate_series(1, 8), t -> q.nq[(j.j - 1) * 8 + t] * b.cv[(j.j - 1) * 8 + t])")} AS lv
       |  FROM qn q, (SELECT unnest(generate_series(1, 8)) AS j) j, cb b),
       |lut AS (SELECT q_id, list(lv ORDER BY j, cix) AS lut FROM lut1 GROUP BY q_id),
       |adc AS (
       |  SELECT p.q_id, c.nbr_id,
       |    ${lsum("list_transform(generate_series(1, 8), j -> l.lut[(j - 1) * 16 + c.code[j] + 1])")} AS adc
       |  FROM codes c
       |  JOIN assigned a ON a.nbr_id = c.nbr_id
       |  JOIN probes p ON p.cid = a.cid
       |  JOIN lut l ON l.q_id = p.q_id
       |  WHERE c.nbr_id <> p.q_id),
       |cand AS (
       |  SELECT q_id, nbr_id FROM (
       |    SELECT q_id, nbr_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, nbr_id ASC) AS rk
       |    FROM adc)
       |  WHERE rk <= 40)
       |SELECT q_id, rank, nbr_id, cos FROM (
       |  SELECT ca.q_id, ca.nbr_id,
       |    round(list_cosine_similarity(q.qv, c.rv), 6) AS cos,
       |    row_number() OVER (PARTITION BY ca.q_id
       |      ORDER BY round(list_cosine_similarity(q.qv, c.rv), 6) DESC,
       |               ca.nbr_id ASC) AS rank
       |  FROM cand ca JOIN corp c ON c.nbr_id = ca.nbr_id
       |  JOIN qn q ON q.q_id = ca.q_id)
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  /** DuckDB replay of `ann_lsh` ([[VectorSearchOps.annLshTopK]],
    * numBits=6, tables=8, seed=42, k=10): the hyperplane matrix is
    * derived, not stored — component (t, b, i) is
    * `mix64(42 + 1000t + 1000003b + i)` mapped to (-1, 1) with the
    * kernel's exact op order ([[VectorImpl.hyperplaneBucket]]), so the
    * 3072-row matrix regenerates bit-identically via the [[U64Sql]]
    * mix chain. Buckets = sign bits of [[lsum]]-ordered dots; a corpus
    * row is a candidate on any shared (table, bucket); candidates
    * rerank by exact rounded cosine.
    */
  private def lshOracleSql: String = {
    import U64Sql._
    s"""WITH
       |hpseed AS (
       |  SELECT t.t, b.b, i.i,
       |    (42 + 1000 * t.t + b.b * 1000003 + i.i)::HUGEINT AS z
       |  FROM (SELECT unnest(generate_series(0, 7)) AS t) t,
       |       (SELECT unnest(generate_series(0, 5)) AS b) b,
       |       (SELECT unnest(generate_series(0, 63)) AS i) i),
       |${mixCtes("hpseed", Seq("t", "b", "i"), "hm")},
       |hp AS (
       |  SELECT t, b, i,
       |    ((z // 2048::HUGEINT)::DOUBLE * (1.0 / 9007199254740992.0)) * 2.0 - 1.0 AS u
       |  FROM hm4),
       |hpl AS (SELECT t, b, list(u ORDER BY i) AS ul FROM hp GROUP BY t, b),
       |corp AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |dots AS (
       |  SELECT c.vec_id, h.t, h.b,
       |    ${lsum("list_transform(generate_series(1, 64), i -> h.ul[i] * c.v[i])")} AS acc
       |  FROM corp c CROSS JOIN hpl h),
       |buck AS (
       |  SELECT vec_id, t, sum(CASE WHEN acc > 0 THEN (1 << b) ELSE 0 END)::BIGINT AS bucket
       |  FROM dots GROUP BY vec_id, t),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS nbr_id
       |  FROM buck c JOIN buck q ON q.t = c.t AND q.bucket = c.bucket
       |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
       |SELECT q_id, rank, nbr_id, cos FROM (
       |  SELECT ca.q_id, ca.nbr_id,
       |    round(list_cosine_similarity(q.v, c.v), 6) AS cos,
       |    row_number() OVER (PARTITION BY ca.q_id
       |      ORDER BY round(list_cosine_similarity(q.v, c.v), 6) DESC,
       |               ca.nbr_id ASC) AS rank
       |  FROM cand ca JOIN corp c ON c.vec_id = ca.nbr_id
       |  JOIN corp q ON q.vec_id = ca.q_id)
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  private val bm25Terms = Seq("spark", "window", "join")

  /** Render a Scala Double as a DuckDB DOUBLE literal. The e-notation
    * forces DuckDB's double parser — a bare decimal literal parses as
    * DECIMAL, whose exact decimal arithmetic rounds differently from
    * IEEE doubles and breaks the bit-exact hash compare.
    * `Double.toString` round-trips, so both engines compute on
    * identical bits.
    */
  private def dlit(x: Double): String =
    if (x.toString.contains("E")) x.toString else s"${x}e0"

  /** DuckDB twin of [[TextAnalysisOps.bm25Search]], generated from the
    * same constants so every double literal matches the Spark side
    * bit-for-bit.
    */
  private def bm25OracleSql(terms: Seq[String], k1: Double, b: Double,
      topK: Int): String = {
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN list_contains(l, '$t') THEN 1 ELSE 0 END) AS df_$i"
    }.mkString(",\n  ")
    val scoreTerms = terms.zipWithIndex.map { case (t, i) =>
      s"(n_docs - df_$i + ${dlit(0.5)}) / (df_$i + ${dlit(0.5)})" +
        s" * (len([y for y in l if y = '$t'])::DOUBLE * ${dlit(k1 + 1.0)})" +
        s" / (len([y for y in l if y = '$t'])::DOUBLE + ${dlit(k1)}" +
        s" * (${dlit(1.0)} - ${dlit(b)} + ${dlit(b)} * dl::DOUBLE" +
        s" / (sum_dl::DOUBLE / n_docs)))"
    }.mkString("\n  + ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l,
       |  len(string_split(text, ' ')) AS dl FROM documents),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
       |  $dfCols FROM d),
       |sc AS (SELECT doc_id,
       |  $scoreTerms AS score
       |FROM d, st)
       |SELECT doc_id, score, rank FROM (
       |  SELECT doc_id, score,
       |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank FROM sc)
       |WHERE rank <= $topK ORDER BY rank""".stripMargin
  }

  /** Near-dup clusters: exact Jaccard pairs -> connected components ->
    * every doc labeled with its component (singletons label themselves).
    * Shared by dd_cluster and dd_canonical.
    *
    * The LABEL table (doc_id, component) is computed ONCE per
    * (session, dir) and persisted — the pair generation + star rounds
    * are the expensive stages (curation-100x: dd_canonical re-ran the
    * full pipeline dd_cluster had just computed, 146 s of pure rework),
    * while the label table itself is two integer columns, metadata-
    * sized at any corpus scale. This is the shape a real pipeline
    * uses: materialize components once, then every consumer (cluster
    * listing, canonical pick, downstream joins) reads the labels. The
    * cache is LRU-bounded (evicted entries unpersist) like
    * [[graft.boostql.BoostQL.onTestdata]]'s family cache; a
    * `spark.catalog.clearCache()` between bench phases unpersists the
    * blocks and the labels recompute on next use — correctness never
    * depends on the cache.
    */
  private val ComponentCacheMax = 4
  private val componentCache =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
        8, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        if (size > ComponentCacheMax) {
          e.getValue.unpersist(blocking = false); true
        } else false
    }

  private def componentLabels(s: SparkSession, d: String): DataFrame =
    componentCache.synchronized {
      Option(componentCache.get((s, d))).getOrElse {
        val doc = docs(s, d)
        val pairs = TextDedupOps.ngramJaccardPairs(doc, "doc_id", "text")
        val cc = GraphOps.connectedComponents(pairs, "id_a", "id_b")
          .withColumnRenamed("id", "doc_id")
        val labels = doc.select(col("doc_id"))
          .join(cc, Seq("doc_id"), "left")
          .withColumn("component", coalesce(col("component"), col("doc_id")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        componentCache.put((s, d), labels)
        labels
      }
    }

  private def clusteredDocs(s: SparkSession, d: String): DataFrame =
    docs(s, d).join(componentLabels(s, d), Seq("doc_id"))

  def queries: Map[String, Q] = Map(
    "dd_exact" -> ((s, d) =>
      TextDedupOps.exactDedup(docs(s, d), "doc_id", "text")
        .select("keep_id", "n_copies").orderBy("keep_id")),

    // exact substring-level dedup: per-doc coverage by 8-token passages
    // shared with at least one other document (Lee et al. 2022).
    // The operator scans its input twice (df branch + positions
    // branch), and each branch pays the tokenize + per-gram md5 +
    // explode BELOW its first exchange — on the one-row-group fixture
    // scan that is two single-task passes over the whole corpus, so
    // fan the pruned (id, text) rows out first (guarded: multi-split
    // production scans take no exchange). Unlike the all-consumers
    // docs fan-out (measured 1.4-3.3x regression), this is one query
    // whose shuffled bytes are tiny against the parallelized work.
    "dd_passages" -> ((s, d) => {
      val in = docs(s, d).select(col("doc_id"), col("text"))
      val p = s.sparkContext.defaultParallelism
      val fanned = if (in.rdd.getNumPartitions < p) in.repartition(p) else in
      TextDedupOps.passageDupStats(fanned, "doc_id", "text", k = 8)
        .orderBy("doc_id")
    }),

    // corpus-trained bigram LM score (CCNet-style quality signal);
    // micro-nat integer quantization keeps the oracle hash exact
    "txt_lm_score" -> ((s, d) =>
      TextAnalysisOps.bigramLmScore(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // tokenizer-aware corpus accounting: train BPE on the corpus sample,
    // count real subword tokens per doc. Fully oracled: the DuckDB SQL
    // replays BOTH the training loop (recursive CTE, weighted pair
    // histogram, same tie-break) and the merge application — see the
    // txt_bpe entry in oracleSql below
    "txt_bpe" -> ((s, d) => {
      val doc = docs(s, d)
      // the synthetic corpus has a tiny vocabulary — a 200-merge table
      // would absorb every word whole (ratio 1.0 everywhere); 30 merges
      // keep rarer words multi-token so the stat discriminates
      val merges = TextAnalysisOps.trainBpe(doc, "text", numMerges = 30)
      TextAnalysisOps.bpeTokenStats(doc, "text", merges)
        .select("doc_id", "n_words", "n_bpe_tokens", "bpe_per_word")
        .orderBy("doc_id")
    }),

    // canonical text normalization (NFC + control strip + whitespace
    // collapse): output hashed so the compare stays small; the oracle
    // replays the identical regex chain in DuckDB
    "txt_normalize" -> ((s, d) =>
      TextAnalysisOps.normalizeText(docs(s, d), "text")
        .select(col("doc_id"), md5(col("norm_text")).as("h"),
          length(col("norm_text")).cast("long").as("n"))
        .orderBy("doc_id")),

    // DSIR importance selection: keep the 100 raw docs whose hashed-
    // unigram distribution best matches the English-doc target slice
    "pipe_dsir" -> ((s, d) => {
      val doc = docs(s, d)
      CorpusOps.dsirSelect(doc, doc.filter(col("lang") === "en"),
          "doc_id", "text", k = 100)
        .orderBy("doc_id")
    }),

    // text → hashed-TF-IDF → cosine top-k: the ANN tier running on raw
    // text with no external embedding model. The exact-integer sparse
    // formulation (idf in 1e-4-nat units) makes every weight, norm and
    // dot product associativity-free long arithmetic, so the cosine —
    // and with it the ranking — hash-matches the DuckDB SQL replay; the
    // float-kernel path (tfidfVectors + bruteForceTopK) stays covered
    // by PipelineSpec parity tests.
    "ann_tfidf" -> ((s, d) =>
      TextAnalysisOps.tfidfCosineTopK(docs(s, d), "doc_id", "text",
          queryMaxId = 3L, k = 10)
        .orderBy("q_id", "rank")),

    "dd_ngram_jaccard" -> ((s, d) =>
      TextDedupOps.ngramJaccardPairs(docs(s, d), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    "dd_minhash_lsh" -> ((s, d) =>
      TextDedupOps.minhashDedupPairs(docs(s, d), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    "dd_simhash" -> ((s, d) =>
      TextDedupOps.simhashDedupPairs(docs(s, d), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    // pair set -> clusters (large-star/small-star CC, GraphOps) -> every
    // doc labeled; oracle recomputes the same labels via recursive CTE
    "dd_cluster" -> ((s, d) =>
      clusteredDocs(s, d).select("doc_id", "component").orderBy("doc_id")),

    // graph shape of the near-dup pair set: degree, per-node triangle
    // count (degree-ordered node-iterator) and clustering coefficient —
    // template-family vs boilerplate-hub discrimination
    "graph_triangles" -> ((s, d) =>
      GraphOps.triangleStats(
          TextDedupOps.ngramJaccardPairs(docs(s, d), "doc_id", "text"),
          "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // PageRank centrality over the near-dup graph in exact fixed-point
    // integer arithmetic (10 iterations, damping 17/20): which document
    // is the HUB of its template family — the canonical-pick signal
    // complementing dd_canonical's longest-doc rule. Integer ops make
    // the result summation-order independent, so the oracle unrolls the
    // same ten iterations bit-identically
    "graph_pagerank" -> ((s, d) =>
      GraphOps.pageRank(
          TextDedupOps.ngramJaccardPairs(docs(s, d), "doc_id", "text"),
          "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
        .withColumnRenamed("r", "rank_fp")
        .orderBy("doc_id")),

    // cluster resolution: keep each component's longest doc (tie -> min
    // id) — the survivor list a dedup pipeline actually emits
    "dd_canonical" -> ((s, d) =>
      CorpusOps.canonicalPerGroup(clusteredDocs(s, d),
          "component", "n_chars", "doc_id")
        .select(col("component"), col("doc_id").as("keep_id"), col("n_chars"))
        .orderBy("component")),

    "dd_embed_cosine" -> ((s, d) =>
      TextDedupOps.embeddingDedupPairs(embs(s, d), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b")),

    // SemDeDup cluster-blocked semantic dedup — the scale path for
    // embedding near-dup (within-cluster exact pairs instead of n²).
    // With 10 clusters x 3 probes on this corpus it recovers the exact
    // pair set, so it shares dd_embed_cosine's DuckDB oracle shape.
    "dd_semantic" -> ((s, d) =>
      SemanticDedupOps.semanticDedupPairs(embs(s, d), "vec_id", "embedding", 0.45,
          k = 10, probes = 3, iters = 4)
        .orderBy("id_a", "id_b")),

    "ann_topk" -> ((s, d) => {
      val e = embs(s, d)
      VectorSearchOps.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select("q_id", "rank", "nbr_id", "cos").orderBy("q_id", "rank")
    }),

    "ann_sq8" -> ((s, d) => {
      // scalar quantization: per-dim byte codes against corpus-wide
      // [min,max] bounds (one agg pass -> driver artifact), approximate
      // scan over the dequantized codes, exact refine on survivors —
      // fully deterministic, so the oracle replays bounds + round-trip
      val e = embs(s, d)
      VectorSearchOps.sq8TopK(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select("q_id", "rank", "nbr_id", "cos").orderBy("q_id", "rank")
    }),

    "ann_filtered" -> ((s, d) => {
      // metadata-constrained search, PRE-filtered (exact recall over
      // the satisfying subset): corpus restricted to english docs via a
      // documents semi-join, and each query scoped to its OWN label
      // (tenant isolation) — the label equality turns the scoring join
      // into a broadcast hash join instead of a cross join
      val e = embs(s, d)
      val corpus = e.join(Tables.documents(s, d)
        .filter(col("lang") === "en").select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "leftsemi")
      VectorSearchOps.filteredTopK(corpus, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, Seq("label"))
        .select("q_id", "rank", "nbr_id", "cos").orderBy("q_id", "rank")
    }),

    "ann_lsh" -> ((s, d) => {
      // approximate vs brute force, but deterministic: the DuckDB oracle
      // regenerates the derived hyperplane matrix and replays bucketing
      // + rerank exactly (lshOracleSql); recall floor in PipelineSpec
      val e = embs(s, d)
      VectorSearchOps.annLshTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select("q_id", "rank", "nbr_id", "cos").orderBy("q_id", "rank")
    }),

    "ann_ivf" -> ((s, d) => {
      // IVF coarse quantizer — approximate vs brute force but fully
      // deterministic arithmetic over a portable md5-sampled centroid
      // set, so the DuckDB oracle replays it exactly (sample → assign →
      // probe → score); recall floor additionally asserted in
      // PipelineSpec
      val e = embs(s, d)
      VectorSearchOps.ivfTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select("q_id", "rank", "nbr_id", "cos").orderBy("q_id", "rank")
    }),

    "ann_pq" -> ((s, d) => {
      // product-quantization ADC scan + exact refine — approximate vs
      // brute force, but deterministic: the DuckDB oracle replays the
      // md5-sampled codebook, encode, LUT, ADC, and refine exactly
      // (pqOracleSql); recall floor + determinism in PipelineSpec
      val e = embs(s, d)
      VectorSearchOps.pqTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select("q_id", "rank", "nbr_id", "cos").orderBy("q_id", "rank")
    }),

    "ann_ivfpq" -> ((s, d) => {
      // the IVF-PQ composite (FAISS IVFPQ, by_residual=false): coarse
      // list pruning BEFORE the compressed ADC scan, exact refine after
      // — the full 100 TB shape. Deterministic end to end: the DuckDB
      // oracle replays both md5 samples, the assignment/probes, encode,
      // LUT, the ADC restricted to probed lists, and the refine exactly
      // (ivfPqOracleSql); recall floor in PipelineSpec
      val e = embs(s, d)
      VectorSearchOps.ivfPqTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select("q_id", "rank", "nbr_id", "cos").orderBy("q_id", "rank")
    }),

    "txt_stats" -> ((s, d) =>
      TextAnalysisOps.tokenStats(docs(s, d), "text")
        .select("doc_id", "n_tokens", "n_distinct", "n_words",
          "avg_token_chars", "stopword_ratio")
        .orderBy("doc_id")),

    "txt_quality" -> ((s, d) =>
      TextAnalysisOps.qualityScore(docs(s, d), "text")
        .select("doc_id", "quality").orderBy("doc_id")),

    // model-based corpus filter: hashed-feature linear classifier, one
    // narrow pass. The oracle compares the exact columns (logit is an
    // integer-sum divided once — bit-identical cross-engine); the
    // sigmoid `score` stays Spark-side (libm exp is not a cross-engine
    // contract)
    "txt_classify" -> ((s, d) =>
      TextAnalysisOps.classifierScore(docs(s, d), "doc_id", "text",
          clfWeights, clfBias)
        .select("doc_id", "n_tokens", "logit", "keep")
        .orderBy("doc_id")),

    // the same scoring tier applied to a DOCUMENT STREAM (AvailableNow
    // replay): per-language keep/drop ledger, hash-matching the batch
    // oracle — stateless maps are mode-agnostic by construction
    "stream_classify" -> ((s, d) =>
      graft.streaming.StreamingOps.streamingCurationReplay(
        s, d, clfWeights, clfBias)),

    // threshold calibration for the quality gate: PR sweep of the
    // classifier logit against a deterministic relevance label — one
    // corpus aggregation into integer bin counts, running sums over
    // the 20-row bin table, exact-integer precision/recall
    "pipe_calibrate" -> ((s, d) => {
      val scored = TextAnalysisOps.classifierScore(docs(s, d), "doc_id",
        "text", clfWeights, clfBias)
      val labeled = scored.join(
        docs(s, d).select(col("doc_id"), (col("n_chars") > 250).as("pos")),
        "doc_id")
      CorpusOps.thresholdSweep(labeled, "logit", "pos",
          calBins, calLo, calHi)
        .orderBy("bin")
    }),

    "txt_langid" -> ((s, d) =>
      TextAnalysisOps.languageId(docs(s, d), "text")
        .select("doc_id", "pred_lang", "lang_hits").orderBy("doc_id")),

    "txt_fingerprint" -> ((s, d) =>
      // graft-native rolling-hash fingerprint + simhash — full DuckDB
      // oracle (exact u64 replay of both kernels, fingerprintOracleSql);
      // determinism + collision properties additionally in PipelineSpec
      docs(s, d).select(col("doc_id"),
        GraftFunctions.fingerprint(col("text"), 16).as("fp"),
        GraftFunctions.simhash(TextDedupOps.hashedShingles(col("text"))).as("sim"))
        .orderBy("doc_id")),

    // deterministic md5-keyed train/holdout assignment — reproducible
    // across engines/runs/partitionings (CorpusOps.hashSplit)
    "pipe_split" -> ((s, d) =>
      CorpusOps.hashSplit(docs(s, d), "doc_id", 0.9)
        .select("doc_id", "split").orderBy("doc_id")),

    // fixed-size overlapping token-window chunking (32-token windows,
    // 8-token overlap) — the RAG/context-window splitter; narrow
    // split→sequence→explode, no shuffle (CorpusOps.chunkDocuments)
    "pipe_chunk" -> ((s, d) =>
      CorpusOps.chunkDocuments(docs(s, d), "doc_id", "text", 32, 8)
        .orderBy("doc_id", "chunk_id")),

    // deterministic md5-keyed global shuffle (CorpusOps.deterministicShuffle)
    "pipe_shuffle" -> ((s, d) =>
      CorpusOps.deterministicShuffle(docs(s, d), "doc_id", "42")
        .select("doc_id", "shuffle_key")),

    // language rebalance: downsample en to 50%, zh to 25%, keep the rest
    // — deterministic per-id thresholds (CorpusOps.stratifiedSample)
    "pipe_stratified" -> ((s, d) =>
      CorpusOps.stratifiedSample(docs(s, d), "doc_id", "lang",
          Map("en" -> 0.5, "zh" -> 0.25))
        .select("doc_id", "lang").orderBy("doc_id")),

    // corpus vocabulary: top tokens by document frequency
    "txt_vocab" -> ((s, d) =>
      TextAnalysisOps.vocabulary(docs(s, d), "text", 100)),

    // PII redaction over a deterministically synthesized contact suffix
    // (the corpus itself has no digits); both engines build the same
    // string, then scrub with the same RE2-and-Java-compatible patterns
    "txt_pii" -> ((s, d) => {
      val aug = docs(s, d).withColumn("t", concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or +1-202-555-0"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"),
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
      TextAnalysisOps.piiRedact(aug, "t")
        .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
        .orderBy("doc_id")
    }),

    "mm_meta" -> ((s, d) =>
      // multimodal metadata pass: opaque binary payload + typed metadata
      docs(s, d).select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha_hex"))
        .orderBy("doc_id")),

    // audio metadata e2e through REAL payloads: per doc, a genuine PCM
    // WAV (RIFF header + samples, written by javax.sound.sampled with
    // doc_id-derived rate/channels/frames) is decoded back by the same
    // pure-JVM parser — the oracle recomputes the expected header
    // fields analytically from the derivation. Closes the audio half of
    // the multimodal stub; compressed formats remain the declared stub.
    "mm_audio" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // NOT fanned out: javax.sound.sampled's provider registry
      // serializes concurrent readers, so the parallel form measured
      // 2.2x WORSE than the single-task one (matched A/B at sf0.1);
      // the WAV header parse is cheap enough that one task wins
      val media = docs(s, d).select(col("doc_id")).as[Long].map { id =>
        val rate = 8000 + (id % 4).toInt * 4000
        val ch = 1 + (id % 2).toInt
        val frames = 400 + (id % 100).toInt
        graft.multimodal.MediaRow(id, "wav",
          graft.multimodal.MultimodalOps.AudioCodec.syntheticWav(rate, ch, frames))
      }
      graft.multimodal.MultimodalOps.extractAudioMeta(media)
        .filter(col("real_decode"))
        .select(col("media_id").as("doc_id"), col("sample_rate"),
          col("channels"), col("bits"), col("n_frames"), col("duration_ms"))
        .orderBy("doc_id")
    }),

    // video metadata e2e through REAL containers: per doc, a genuine
    // minimal MP4 (ftyp + moov/mvhd/trak/tkhd/stts boxes with
    // doc_id-derived timescale/dims/frame-count) is parsed back by the
    // pure-JVM ISO-BMFF walker — the oracle recomputes every header
    // field analytically from the derivation. Container metadata is a
    // real parse; frame-pixel decode remains the declared stub.
    "mm_video" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val media = docIds(s, d).map { id =>
        val timescale = Array(600L, 1000L, 90000L)((id % 3).toInt)
        val nFrames = 24 + id % 72
        val delta = timescale / 24
        graft.multimodal.MediaRow(id, "mp4",
          graft.multimodal.MultimodalOps.VideoCodec.syntheticMp4(
            timescale, nFrames * delta, 320 + (id % 8).toInt * 160,
            240 + (id % 6).toInt * 120, nFrames, delta))
      }
      graft.multimodal.MultimodalOps.extractVideoMeta(media)
        .filter(col("real_decode"))
        .select(col("media_id").as("doc_id"), col("timescale"),
          col("duration_ms"), col("width"), col("height"), col("n_frames"))
        .orderBy("doc_id")
    }),

    // image resize e2e through REAL pixels: per doc, a genuine PNG
    // (doc_id-derived dims, deterministic pixel fill) goes through the
    // full ImageIO decode -> bilinear scale -> PNG re-encode path, and
    // the output dims are decoded BACK from the re-encoded payload — a
    // row only matches if the whole pixel pipeline ran for real
    "mm_resize" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val media = docIds(s, d).map { id =>
        graft.multimodal.MediaRow(id, "png",
          graft.multimodal.MultimodalOps.ImageCodec.syntheticPng(
            16 + (id % 5).toInt * 8, 12 + (id % 3).toInt * 6, id))
      }
      val resized = graft.multimodal.MultimodalOps.resize(media, 24, 18)
      graft.multimodal.MultimodalOps.extractFeatures(resized).toDF()
        .select(col("media_id").as("doc_id"), col("format"),
          col("width"), col("height"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition signals: dup-token / dup-bigram /
    // top-bigram fractions per document (TextAnalysisOps.repetitionStats)
    "txt_repetition" -> ((s, d) =>
      TextAnalysisOps.repetitionStats(docs(s, d), "text")
        .select("doc_id", "n_tokens", "dup_token_frac", "dup_bigram_frac",
          "top_bigram_frac")
        .orderBy("doc_id")),

    // BM25 keyword search (rational-idf variant) — global top-20 docs
    // for a 3-term query (TextAnalysisOps.bm25Search)
    "txt_bm25" -> ((s, d) =>
      TextAnalysisOps.bm25Search(docs(s, d), "doc_id", "text", bm25Terms)
        .select("doc_id", "score", "rank").orderBy("rank")),

    // benchmark-contamination check: corpus docs sharing >= 80% of a
    // benchmark doc's 3-gram shingles; the "benchmark" is the
    // deterministic doc_id % 37 == 0 slice, modeling an eval set that
    // leaked into the training corpus (TextDedupOps.crossCorpusOverlap)
    "pipe_decontam" -> ((s, d) => {
      val doc = docs(s, d)
      TextDedupOps.crossCorpusOverlap(doc,
          doc.filter(col("doc_id") % 37 === 0), "doc_id", "doc_id", "text")
        .orderBy("doc_id", "bench_id")
    }),

    // temperature-flattened language mixing at T=2 (square-root
    // sampling): dominant langs downsampled toward uniform, smallest
    // kept wholesale (CorpusOps.temperatureMix)
    "pipe_mix" -> ((s, d) =>
      CorpusOps.temperatureMix(docs(s, d), "doc_id", "lang", 2.0)
        .select("doc_id", "lang", "n_stratum", "keep_rate")
        .orderBy("doc_id")),

    // token-budget sequence packing: deal docs into 16 hash groups,
    // greedy 512-token bins within each (CorpusOps.packBins)
    "pipe_pack" -> ((s, d) => {
      val doc = docs(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      CorpusOps.packBins(doc, "doc_id", "n_tokens", 512)
        .select("doc_id", "grp", "bin", "cum_before", "n_tokens")
        .orderBy("doc_id")
    }),

    // the whole curation chain composed end to end, as a user would run
    // it: quality gate -> exact dedup (canonical copy + count) ->
    // near-dup clustering among survivors -> one survivor per cluster
    // (longest doc, tie to min id). Every stage is an operator from
    // this library; the oracle replays the identical chain in SQL.
    "pipe_e2e" -> ((s, d) => {
      val kept = TextAnalysisOps.qualityScore(docs(s, d), "text")
        .filter(col("quality") >= 0.4)
        .select("doc_id", "text", "n_chars")
      val uniq = kept.join(
        TextDedupOps.exactDedup(kept, "doc_id", "text")
          .select(col("keep_id").as("doc_id"), col("n_copies")),
        Seq("doc_id")).localCheckpoint()
      val cc = GraphOps.connectedComponents(
          TextDedupOps.ngramJaccardPairs(uniq, "doc_id", "text"),
          "id_a", "id_b")
        .withColumnRenamed("id", "doc_id")
      val comp = uniq.join(cc, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
      CorpusOps.canonicalPerGroup(comp, "component", "n_chars", "doc_id")
        .select("doc_id", "component", "n_copies", "n_chars")
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // Full BPE replay in pure SQL — training AND application. The merge
    // loop replays as a recursive CTE over a single-row state (distinct
    // words + frequencies as a struct list): each step computes the
    // weighted pair histogram via a correlated unnest/GROUP BY, picks
    // argmax with the (-count, pair) tie-break, and applies the merge
    // with a list_reduce that mirrors the left-to-right single-pass
    // semantics of trainBpe/BpeImpl (merge-with-last when the pair
    // matches). The sample is replayable because trainBpe orders by
    // md5(text). Application (greedy lowest-rank = rank-order sweep,
    // provable from the merge table's closure property) recurses each
    // distinct corpus word through the merge list. '|' never occurs in
    // the corpus, so it is a safe symbol delimiter.
    "txt_bpe" ->
      """WITH RECURSIVE
        |sample AS (
        |  SELECT text FROM (
        |    SELECT text, md5(text) AS h FROM documents ORDER BY h LIMIT 1000)
        |),
        |w0 AS (
        |  SELECT list({s: sym, f: f}) AS words FROM (
        |    SELECT list_reduce(string_split(w, ''), (a, x) -> a || '|' || x) AS sym,
        |      COUNT(*)::BIGINT AS f
        |    FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |          FROM sample)
        |    GROUP BY 1)
        |),
        |train AS (
        |  SELECT 0 AS r, words, []::VARCHAR[] AS merges FROM w0
        |  UNION ALL
        |  SELECT r + 1,
        |    list_transform(words, e -> {
        |      s: list_reduce(string_split(e.s, '|'), (acc, x) ->
        |        CASE WHEN regexp_extract(acc, '[^|]*$') = split_part(best, ' ', 1)
        |               AND x = split_part(best, ' ', 2)
        |             THEN substr(acc, 1, len(acc) - len(regexp_extract(acc, '[^|]*$')))
        |                  || split_part(best, ' ', 1) || split_part(best, ' ', 2)
        |             ELSE acc || '|' || x END),
        |      f: e.f}),
        |    list_append(merges, best)
        |  FROM (
        |    SELECT r, words, merges,
        |      (SELECT pr FROM (
        |         SELECT pr, SUM(pf) AS c FROM (
        |           SELECT unnest(list_transform(
        |               list_zip(string_split(e.s,'|')[:-2], string_split(e.s,'|')[2:]),
        |               q -> q[1] || ' ' || q[2])) AS pr,
        |             e.f AS pf
        |           FROM unnest(words) AS t(e))
        |         GROUP BY pr)
        |       ORDER BY c DESC, pr ASC LIMIT 1) AS best
        |    FROM train WHERE r < 30)
        |  WHERE best IS NOT NULL
        |),
        |mergetab AS MATERIALIZED (
        |  SELECT m.merges[i] AS mg, i AS rk
        |  FROM (SELECT merges FROM train ORDER BY r DESC LIMIT 1) m,
        |       LATERAL (SELECT unnest(range(1, len(m.merges) + 1)) AS i)
        |),
        |corpus_words AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |  FROM documents
        |),
        |bpe AS (
        |  SELECT w, list_reduce(string_split(w, ''), (a, x) -> a || '|' || x) AS sym,
        |    0 AS r
        |  FROM (SELECT DISTINCT w FROM corpus_words)
        |  UNION ALL
        |  SELECT w,
        |    list_reduce(string_split(sym, '|'), (acc, x) ->
        |      CASE WHEN regexp_extract(acc, '[^|]*$') = split_part(mg, ' ', 1)
        |             AND x = split_part(mg, ' ', 2)
        |           THEN substr(acc, 1, len(acc) - len(regexp_extract(acc, '[^|]*$')))
        |                || split_part(mg, ' ', 1) || split_part(mg, ' ', 2)
        |           ELSE acc || '|' || x END),
        |    r + 1
        |  FROM bpe JOIN mergetab ON mergetab.rk = bpe.r + 1
        |),
        |tok AS (
        |  SELECT w, len(string_split(sym, '|'))::BIGINT AS ntok FROM bpe
        |  QUALIFY row_number() OVER (PARTITION BY w ORDER BY r DESC) = 1
        |),
        |agg AS (
        |  SELECT cw.doc_id, SUM(tok.ntok)::BIGINT AS n_bpe
        |  FROM corpus_words cw JOIN tok ON tok.w = cw.w
        |  GROUP BY cw.doc_id
        |)
        |SELECT d.doc_id, len(string_split(d.text, ' '))::BIGINT AS n_words,
        |  COALESCE(a.n_bpe, 0) AS n_bpe_tokens,
        |  COALESCE(a.n_bpe, 0)::DOUBLE / len(string_split(d.text, ' '))::DOUBLE
        |    AS bpe_per_word
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "dd_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "dd_passages" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, len(l) AS n_tokens,
        |        unnest(generate_series(1, len(l) - 7)) AS pos
        |      FROM t WHERE len(l) >= 8),
        |sh AS (SELECT doc_id, n_tokens, pos,
        |         md5(array_to_string(l[pos:pos+7], ' ')) AS h FROM p),
        |dup AS (SELECT h FROM sh GROUP BY h
        |        HAVING COUNT(DISTINCT doc_id) >= 2),
        |m AS (SELECT s.doc_id, s.n_tokens, s.pos FROM sh s JOIN dup USING (h)),
        |w AS (SELECT doc_id, n_tokens,
        |        COALESCE(LEAST(8, pos - LAG(pos) OVER
        |          (PARTITION BY doc_id ORDER BY pos)), 8) AS gain FROM m)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  COUNT(*) AS dup_grams, CAST(SUM(gain) AS BIGINT) AS covered_tokens,
        |  CAST(SUM(gain) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_fraction
        |FROM w GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,

    "txt_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |    '[ \t\n\r]+', ' ', 'g'))) AS h,
        |  CAST(length(trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |    '[ \t\n\r]+', ' ', 'g'))) AS BIGINT) AS n
        |FROM documents ORDER BY doc_id""".stripMargin,

    // add-one smoothing over the FULL 256-bucket space (matching the
    // Spark side's driver-built literal map); buckets untouched by any
    // raw token never score, so enumerating only raw buckets suffices
    "pipe_dsir" ->
      """WITH tt AS (SELECT unnest(string_split(text, ' ')) AS tok
        |            FROM documents WHERE lang = 'en'),
        |th AS (SELECT substr(md5(tok), 1, 2) AS b, COUNT(*) AS c
        |       FROM tt GROUP BY 1),
        |rt AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |rh AS (SELECT substr(md5(tok), 1, 2) AS b, COUNT(*) AS c
        |       FROM rt GROUP BY 1),
        |tot AS (SELECT (SELECT SUM(c) FROM th) + 256 AS tsum,
        |               (SELECT SUM(c) FROM rh) + 256 AS rsum),
        |lr AS (SELECT rh.b,
        |         CAST(ROUND((LN(CAST(COALESCE(th.c, 0) + 1 AS DOUBLE)
        |                        / CAST(tsum AS DOUBLE))
        |                   - LN(CAST(rh.c + 1 AS DOUBLE)
        |                        / CAST(rsum AS DOUBLE))) * 1000000)
        |              AS BIGINT) AS lrm
        |       FROM rh LEFT JOIN th USING (b) CROSS JOIN tot),
        |dt AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |         unnest(string_split(text, ' ')) AS tok FROM documents),
        |dw AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |         CAST(SUM(lrm) AS BIGINT) AS logw_micro
        |       FROM (SELECT doc_id, n_tokens, substr(md5(tok), 1, 2) AS b
        |             FROM dt) x JOIN lr USING (b)
        |       GROUP BY doc_id, n_tokens)
        |SELECT doc_id, n_tokens, logw_micro FROM
        |  (SELECT * FROM dw ORDER BY logw_micro DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // the exact-integer sparse TF-IDF replay: same tokenizer (single-
    // space split), same md5-prefix bucket, same 1e-4-nat idf
    // quantization → identical longs, identical IEEE cosine division
    "ann_tfidf" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |tok AS (SELECT doc_id, unnest(l) AS tok FROM t),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
        |dfc AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM t),
        |sparse AS (
        |  SELECT doc_id,
        |    CAST(from_hex(substr(md5(tok), 1, 8))::BIT::UINTEGER AS BIGINT) % 256 AS b,
        |    CAST(SUM(tf * CAST(ROUND((LN(CAST(n_docs + 1 AS DOUBLE)
        |      / CAST(df + 1 AS DOUBLE)) + 1) * 10000) AS BIGINT)) AS BIGINT) AS w
        |  FROM tf JOIN dfc USING (tok) CROSS JOIN n
        |  GROUP BY 1, 2),
        |norms AS (SELECT doc_id, sqrt(CAST(CAST(SUM(w * w) AS BIGINT) AS DOUBLE)) AS nrm
        |          FROM sparse GROUP BY doc_id),
        |dots AS (SELECT q.doc_id AS q_id, c.doc_id AS nbr_id,
        |    CAST(SUM(c.w * q.w) AS BIGINT) AS dot
        |  FROM sparse c JOIN (SELECT * FROM sparse WHERE doc_id < 3) q USING (b)
        |  GROUP BY 1, 2),
        |scored AS (SELECT q_id, nbr_id,
        |    CAST(dot AS DOUBLE) / (qn.nrm * cn.nrm) AS cos
        |  FROM dots JOIN norms qn ON qn.doc_id = q_id
        |            JOIN norms cn ON cn.doc_id = nbr_id)
        |SELECT q_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, nbr_id)
        |    AS BIGINT) AS rank,
        |  nbr_id, cos
        |FROM scored QUALIFY rank <= 10
        |ORDER BY q_id, rank""".stripMargin,

    "txt_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        |      FROM t WHERE len(l) >= 2),
        |bg AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2 FROM p),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
        |v AS (SELECT COUNT(DISTINCT tok) AS v
        |      FROM (SELECT unnest(l) AS tok FROM t)),
        |scored AS (SELECT b.doc_id,
        |    CAST(ROUND(LN(CAST(c2.c2 + 1 AS DOUBLE)
        |      / CAST(c1.c1 + v.v AS DOUBLE)) * 1000000) AS BIGINT) AS lp
        |  FROM bg b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(lp) AS BIGINT) AS logprob_micro,
        |  CAST(SUM(lp) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_logprob
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dd_ngram_jaccard" ->
      s"""$shingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jaccardExpr AS jac
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE $jaccardExpr >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "dd_minhash_lsh" ->
      s"""$shingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jaccardExpr AS jac
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE $jaccardExpr >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "dd_simhash" ->
      s"""$shingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE $jaccardExpr >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "dd_cluster" ->
      s"""$componentCte
         |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin,

    "graph_triangles" ->
      s"""$triangleCte
         |SELECT d.id AS doc_id, d.degree,
         |  coalesce(t.triangles, 0) AS triangles,
         |  CASE WHEN d.degree >= 2
         |       THEN 2.0e0 * coalesce(t.triangles, 0) / (d.degree * (d.degree - 1))
         |       ELSE 0.0e0 END AS clustering
         |FROM deg d LEFT JOIN tcnt t ON t.id = d.id
         |ORDER BY doc_id""".stripMargin,

    "graph_pagerank" -> pageRankOracle,

    "dd_canonical" ->
      s"""$componentCte
         |SELECT component, keep_id, n_chars FROM (
         |  SELECT c.component, d.doc_id AS keep_id, d.n_chars,
         |    row_number() OVER (PARTITION BY c.component
         |                       ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
         |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
         |WHERE rk = 1 ORDER BY component""".stripMargin,

    "dd_embed_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,

    // the cluster-blocked path recovers the full exact pair set on this
    // corpus (recall contract pinned in SemanticDedupSpec), so its
    // oracle is the same all-pairs SQL
    "dd_semantic" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,

    "ann_topk" ->
      """SELECT q_id, rank, nbr_id, cos FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nbr_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // SQ8 replay: per-dim [min,max] bounds, quantize round(255·t) and
    // dequantize lo + code/255·(hi−lo) with the SAME expression shape
    // as the Spark side, rounded-approx candidate cut at k·refine, then
    // the exact rounded-cosine refine
    "ann_sq8" ->
      """WITH stats AS (
        |  SELECT i, min(embedding[i]::DOUBLE) AS lo, max(embedding[i]::DOUBLE) AS hi
        |  FROM embeddings, generate_series(1, 64) AS g(i) GROUP BY i),
        |arrs AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his
        |  FROM stats),
        |dec AS (
        |  SELECT vec_id,
        |    [CASE WHEN his[i] = los[i] THEN los[i]
        |          ELSE los[i] + round((embedding[i]::DOUBLE - los[i])
        |            / (his[i] - los[i]) * 255) / 255.0 * (his[i] - los[i]) END
        |     for i in generate_series(1, 64)] AS dv
        |  FROM embeddings, arrs),
        |cand AS (
        |  SELECT q_id, nbr_id FROM (
        |    SELECT q.vec_id AS q_id, c.vec_id AS nbr_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.dv), 6) DESC,
        |                 c.vec_id ASC) AS rk
        |    FROM embeddings q JOIN dec c ON c.vec_id <> q.vec_id
        |    WHERE q.vec_id < 5)
        |  WHERE rk <= 40)
        |SELECT q_id, rank, nbr_id, cos FROM (
        |  SELECT cand.q_id, cand.nbr_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos,
        |    row_number() OVER (PARTITION BY cand.q_id
        |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
        |               cand.nbr_id ASC) AS rank
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.q_id
        |    JOIN embeddings c ON c.vec_id = cand.nbr_id)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // filtered replay: same rounded-cosine ranking as ann_topk with the
    // english semi-join and per-query label equality as pre-filters
    "ann_filtered" ->
      """SELECT q_id, rank, nbr_id, cos FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nbr_id,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
        |               c.vec_id ASC) AS rank
        |  FROM embeddings q JOIN embeddings c
        |    ON c.label = q.label AND c.vec_id <> q.vec_id
        |  JOIN documents d ON d.doc_id = c.vec_id AND d.lang = 'en'
        |  WHERE q.vec_id < 5)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "ann_lsh" -> lshOracleSql,
    "ann_pq" -> pqOracleSql,
    "ann_ivfpq" -> ivfPqOracleSql,

    // full IVF replay: same portable md5-ordered centroid sample as
    // VectorSearchOps.ivfTopK (nlist=32), argmax-cosine list assignment
    // (tie -> first centroid in sample order), nprobe=4 probes per query
    // (tie -> lowest centroid id, matching the Spark window), exact
    // rounded-cosine top-10 over probed lists
    "ann_ivf" ->
      """WITH cents AS (
        |  SELECT vec_id AS ccid, embedding::DOUBLE[] AS ccv,
        |    row_number() OVER (ORDER BY md5(vec_id::VARCHAR) ASC) AS ord
        |  FROM embeddings ORDER BY md5(vec_id::VARCHAR) ASC LIMIT 32),
        |assigned AS (
        |  SELECT nbr_id, cv, ccid AS cid FROM (
        |    SELECT c.vec_id AS nbr_id, c.embedding::DOUBLE[] AS cv, ce.ccid,
        |      row_number() OVER (PARTITION BY c.vec_id
        |        ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], ce.ccv) DESC,
        |                 ce.ord ASC) AS rk
        |    FROM embeddings c CROSS JOIN cents ce)
        |  WHERE rk = 1),
        |probes AS (
        |  SELECT q_id, qv, ccid AS cid FROM (
        |    SELECT q.vec_id AS q_id, q.embedding::DOUBLE[] AS qv, ce.ccid,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], ce.ccv) DESC,
        |                 ce.ccid ASC) AS rk
        |    FROM embeddings q CROSS JOIN cents ce WHERE q.vec_id < 5)
        |  WHERE rk <= 4)
        |SELECT q_id, rank, nbr_id, cos FROM (
        |  SELECT p.q_id, a.nbr_id,
        |    round(list_cosine_similarity(p.qv, a.cv), 6) AS cos,
        |    row_number() OVER (PARTITION BY p.q_id
        |      ORDER BY round(list_cosine_similarity(p.qv, a.cv), 6) DESC,
        |               a.nbr_id ASC) AS rank
        |  FROM assigned a JOIN probes p ON a.cid = p.cid
        |  WHERE a.nbr_id <> p.q_id)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "txt_stats" ->
      """SELECT doc_id,
        |  len(l) AS n_tokens,
        |  len(list_distinct(l)) AS n_distinct,
        |  len(regexp_extract_all(text, '[a-z0-9]+')) AS n_words,
        |  (length(text) - (len(l) - 1))::DOUBLE / len(l) AS avg_token_chars,
        |  len([x for x in l if (x = 'the' OR x = 'a')])::DOUBLE / len(l) AS stopword_ratio
        |FROM (SELECT *, string_split(text, ' ') AS l FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      """SELECT doc_id,
        |  (len(list_distinct(l))::DOUBLE / len(l)) *
        |  (1.0 - len([x for x in l if (x = 'the' OR x = 'a')])::DOUBLE / len(l)) AS quality
        |FROM (SELECT *, string_split(text, ' ') AS l FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "txt_classify" -> clfOracleSql,
    "pipe_calibrate" -> calibrateOracleSql,

    // the resized dims are the fixed target by construction — but the
    // Spark side only produces them by decoding the RE-ENCODED pixels
    "mm_resize" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(24 AS INT) AS width, CAST(18 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "stream_classify" -> clfLedgerOracleSql,

    "txt_langid" ->
      """SELECT doc_id,
        |  CASE WHEN h_en = m THEN 'en' WHEN h_es = m THEN 'es'
        |       WHEN h_fr = m THEN 'fr' WHEN h_de = m THEN 'de'
        |       WHEN h_zh = m THEN 'zh' END AS pred_lang,
        |  m AS lang_hits
        |FROM (
        |  SELECT doc_id, h_en, h_es, h_fr, h_de, h_zh,
        |    greatest(h_en, h_es, h_fr, h_de, h_zh) AS m
        |  FROM (
        |    SELECT doc_id,
        |      len([x for x in l if (x='the' OR x='a' OR x='of' OR x='and')]) AS h_en,
        |      len([x for x in l if (x='el' OR x='la' OR x='de' OR x='y')]) AS h_es,
        |      len([x for x in l if (x='le' OR x='la' OR x='de' OR x='et')]) AS h_fr,
        |      len([x for x in l if (x='der' OR x='die' OR x='das' OR x='und')]) AS h_de,
        |      len([x for x in l if (x='de' OR x='le' OR x='he' OR x='shi')]) AS h_zh
        |    FROM (SELECT *, string_split(text, ' ') AS l FROM documents)))
        |ORDER BY doc_id""".stripMargin,

    "txt_fingerprint" -> fingerprintOracleSql,

    "mm_meta" ->
      """SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
        |  sha256(text) AS sha_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the WAV payloads are constructed with doc_id-derived parameters,
    // so the decoded header fields are analytically known; a row only
    // matches if the real RIFF parse round-tripped every field
    "mm_audio" ->
      """SELECT doc_id,
        |  8000 + (doc_id % 4) * 4000 AS sample_rate,
        |  1 + doc_id % 2 AS channels,
        |  CAST(16 AS BIGINT) AS bits,
        |  400 + doc_id % 100 AS n_frames,
        |  CAST(FLOOR(CAST((400 + doc_id % 100) * 1000 AS DOUBLE)
        |    / (8000 + (doc_id % 4) * 4000)) AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the MP4 payloads are constructed with doc_id-derived parameters,
    // so every container field is analytically known; a row only
    // matches if the ISO-BMFF box walk round-tripped all of them
    "mm_video" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
        |      ELSE 90000 END AS ts,
        |    24 + doc_id % 72 AS nf
        |  FROM documents)
        |SELECT doc_id, CAST(ts AS BIGINT) AS timescale,
        |  CAST(FLOOR(CAST(nf * (ts // 24) * 1000 AS DOUBLE) / ts)
        |    AS BIGINT) AS duration_ms,
        |  320 + (doc_id % 8) * 160 AS width,
        |  240 + (doc_id % 6) * 120 AS height,
        |  nf AS n_frames
        |FROM p ORDER BY doc_id""".stripMargin,

    // 0.9 * 2^32 = 3865470566 = 0xe6666666; fixed-width lowercase hex
    // compares identically as string and as number
    "pipe_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
        |       THEN 'train' ELSE 'holdout' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // step = 32 - 8 = 24; range(0, n, 24) are the window starts (< n),
    // and a non-first start with n - st <= overlap (8) is a window fully
    // inside its predecessor — excluded, the engine's contract
    "pipe_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents WHERE text IS NOT NULL
        |), s AS (
        |  SELECT doc_id, toks, n, unnest(range(0, n, 24)) AS st FROM t
        |)
        |SELECT doc_id, CAST(st / 24 AS BIGINT) AS chunk_id,
        |  array_to_string(toks[st + 1 : st + 32], ' ') AS chunk_text,
        |  CAST(least(32, n - st) AS BIGINT) AS n_tokens
        |FROM s WHERE st = 0 OR n - st > 8
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "pipe_shuffle" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '42') AS shuffle_key
        |FROM documents ORDER BY shuffle_key""".stripMargin,

    // 0.5 * 2^32 = 0x80000000; 0.25 * 2^32 = 0x40000000; default keeps all
    "pipe_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <=
        |  CASE lang WHEN 'en' THEN '80000000' WHEN 'zh' THEN '40000000'
        |       ELSE 'ffffffff' END
        |ORDER BY doc_id""".stripMargin,

    "txt_vocab" ->
      """SELECT token, count(*) AS df FROM (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents))
        |GROUP BY token ORDER BY df DESC, token LIMIT 100""".stripMargin,

    "txt_pii" ->
      """WITH aug AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com or +1-202-555-0'
        |    || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |    || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
        |FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '\+\d[\d-]{6,}\d')) AS n_phones,
        |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d[\d-]{6,}\d', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM aug ORDER BY doc_id""".stripMargin,

    "txt_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |b AS (SELECT doc_id, l,
        |  [array_to_string(l[i:i+1], ' ')
        |   for i in generate_series(1, len(l)-1)] AS bg FROM t)
        |SELECT doc_id, len(l) AS n_tokens,
        |  (len(l) - len(list_distinct(l)))::DOUBLE / len(l) AS dup_token_frac,
        |  (len(bg) - len(list_distinct(bg)))::DOUBLE / len(bg) AS dup_bigram_frac,
        |  list_max([len([y for y in bg if y = x])
        |            for x in list_distinct(bg)])::DOUBLE / len(bg) AS top_bigram_frac
        |FROM b ORDER BY doc_id""".stripMargin,

    "txt_bm25" -> bm25OracleSql(bm25Terms, 1.2, 0.75, 20),

    "pipe_decontam" ->
      s"""$shingleCte
         |SELECT c.doc_id, b.doc_id AS bench_id,
         |  len(list_intersect(c.s, b.s)) AS n_common,
         |  len(list_intersect(c.s, b.s))::DOUBLE / len(b.s) AS frac
         |FROM sh c JOIN sh b ON b.doc_id % 37 = 0
         |WHERE len(list_intersect(c.s, b.s))::DOUBLE / len(b.s) >= ${dlit(0.8)}
         |ORDER BY c.doc_id, bench_id""".stripMargin,

    "pipe_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_stratum FROM documents GROUP BY lang),
        |m AS (SELECT min(n_stratum) AS n_min FROM c),
        |r AS (SELECT lang, n_stratum,
        |    sqrt(n_min::DOUBLE / n_stratum::DOUBLE) AS keep_rate,
        |    printf('%08x', CAST(least(
        |      floor(sqrt(n_min::DOUBLE / n_stratum::DOUBLE) * 4294967296e0),
        |      4294967295e0) AS BIGINT)) AS thr
        |  FROM c, m)
        |SELECT d.doc_id, d.lang, r.n_stratum, r.keep_rate
        |FROM documents d JOIN r ON d.lang = r.lang
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 8) <= r.thr
        |ORDER BY d.doc_id""".stripMargin,

    "pipe_pack" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |  md5(CAST(doc_id AS VARCHAR) || 'pack') AS pack_key FROM documents),
        |g AS (SELECT *, substr(pack_key, 1, 1) AS grp FROM t),
        |c AS (SELECT *,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY grp ORDER BY pack_key
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |    AS cum_before FROM g)
        |SELECT doc_id, grp,
        |  CAST(floor(cum_before::DOUBLE / 512e0) AS BIGINT) AS bin,
        |  cum_before, n_tokens
        |FROM c ORDER BY doc_id""".stripMargin,

    // same chain, replayed in SQL: quality >= 0.4 gate, md5 exact dedup
    // keeping (min id, count), 3-gram Jaccard pairs among unique
    // survivors, min-label components (recursive CTE), longest-doc
    // survivor per component
    "pipe_e2e" ->
      s"""WITH RECURSIVE
         |qd AS (SELECT doc_id, text, n_chars,
         |  (len(list_distinct(l))::DOUBLE / len(l)) *
         |  (1.0 - len([x for x in l if (x = 'the' OR x = 'a')])::DOUBLE / len(l)) AS quality
         |  FROM (SELECT *, string_split(text, ' ') AS l FROM documents)),
         |kept AS (SELECT doc_id, text, n_chars FROM qd WHERE quality >= 0.4e0),
         |ex AS (SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         |       FROM kept GROUP BY md5(text)),
         |uniq AS (SELECT k.doc_id, k.text, k.n_chars, ex.n_copies
         |         FROM kept k JOIN ex ON ex.doc_id = k.doc_id),
         |t AS (SELECT doc_id, string_split(text, ' ') AS l FROM uniq),
         |sh AS (SELECT doc_id,
         |  list_distinct([array_to_string(l[i:i+2], ' ')
         |                 for i in generate_series(1, greatest(len(l)-2, 1))]) AS s
         |  FROM t),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE $jaccardExpr >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM uniq
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
         |comp AS (SELECT id AS doc_id, min(lbl) AS component FROM reach GROUP BY id)
         |SELECT doc_id, component, n_copies, n_chars FROM (
         |  SELECT u.doc_id, c.component, u.n_copies, u.n_chars,
         |    row_number() OVER (PARTITION BY c.component
         |                       ORDER BY u.n_chars DESC, u.doc_id ASC) AS rk
         |  FROM uniq u JOIN comp c ON c.doc_id = u.doc_id)
         |WHERE rk = 1 ORDER BY doc_id""".stripMargin
  )
}
