package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token statistics,
  * quality scoring, stopword-profile language ID. All pure column
  * expressions over built-ins — single narrow pass per document, no
  * shuffle, fully codegen'd; at 100 TB these run at scan speed.
  *
  * Determinism note for oracle parity: every score is rational
  * arithmetic over exact integer counts (no transcendental functions),
  * so Spark and DuckDB produce bit-identical doubles.
  */
object TextAnalysisOps {

  /** Language stopword profiles for the n-gram/stopword-voting
    * language-ID heuristic. Order matters: ties break to the earlier
    * entry (same CASE order is mirrored in oracle SQL).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "fr" -> Seq("le", "la", "de", "et"),
    "de" -> Seq("der", "die", "das", "und"),
    "zh" -> Seq("de", "le", "he", "shi"))

  private def toks(text: Column): Column = split(text, " ")

  /** Count of tokens that appear in `words`. */
  private def stopCount(text: Column, words: Seq[String]): Column =
    size(filter(toks(text), t => words.map(w => t === w).reduce(_ || _)))

  /** Per-document token statistics:
    * n_tokens (whitespace), n_distinct, n_words (regex `[a-z0-9]+` — the
    * BPE-ish subword count), avg_token_chars, stopword_ratio.
    */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", size(toks(t)))
      .withColumn("n_distinct", size(array_distinct(toks(t))))
      .withColumn("n_words", size(regexp_extract_all(t, lit("[a-z0-9]+"), lit(0))))
      .withColumn("avg_token_chars",
        (length(t) - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("stopword_ratio",
        stopCount(t, Seq("the", "a")).cast("double") / col("n_tokens"))
  }

  /** Quality score in [0,1]: lexical diversity damped by stopword
    * excess — `(n_distinct / n_tokens) * (1 - stopword_ratio)`.
    * Rational arithmetic only (cross-engine exact).
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    tokenStats(df, textCol).withColumn("quality",
      (col("n_distinct").cast("double") / col("n_tokens")) *
        (lit(1.0) - col("stopword_ratio")))

  /** FastText-style linear quality-classifier scoring over hashed
    * bag-of-words features — the standard model-based corpus filter
    * (e.g. CCNet / GPT-3-style "looks like reference text" scoring),
    * applied at scale as a pure map.
    *
    * Features use the hashing trick: token → one of 256 buckets keyed
    * by the leading hex pair of md5(token); the document's feature
    * vector is the mean of its token buckets; `logit = bias + w · x`,
    * `score = sigmoid(logit)`, `keep = logit >= 0`.
    *
    * Determinism at scale: weights are quantized to micro-units and
    * accumulated as an exact integer sum, so the score is bit-identical
    * under any partitioning, token order or engine with md5 — floating
    * summation order (which varies with partitioning) never leaks into
    * the result. The weight table is a literal map inlined into the
    * plan (a model artifact, like [[VectorSearchOps.ivfTopK]]'s
    * centroids); scoring is narrow, codegen'd, zero-shuffle.
    *
    * Training is out of scope by design — weights come from the caller
    * (export any logistic model into the 256-bucket space).
    */
  def classifierScore(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double): DataFrame = {
    require(weights.length == 256,
      s"weights must have one entry per hex-pair bucket (256), got ${weights.length}")
    val micro = weights.map(w => math.rint(w * 1e6).toLong)
    val wmap = map(micro.zipWithIndex.toIndexedSeq.flatMap { case (w, i) =>
      Seq(lit(f"$i%02x"), lit(w)) }: _*)
    val t = toks(col(textCol))
    // split("", " ") = [""] so n_tokens >= 1 — no division guard needed
    val lin = aggregate(t, lit(0L),
      (acc, tk) => acc + element_at(wmap, substring(md5(tk), 1, 2)))
    // column-preserving (like qualityScore): callers prune, and Catalyst
    // drops unread input columns anyway — which also means the operator
    // applies to a STREAMING DataFrame unchanged
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("logit", lit(bias) +
        (lin.cast("double") / lit(1000000.0)) / col("n_tokens").cast("double"))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .withColumn("keep", col("logit") >= lit(0.0))
  }

  /** Corpus vocabulary by document frequency: one row per token that
    * appears in at least one document, with `df` = number of distinct
    * documents containing it, top `k` by (df DESC, token ASC) — the
    * tie-break makes the cut deterministic. The whitespace tokenization
    * matches [[tokenStats]].
    *
    * Scale shape: explode → per-doc distinct → groupBy(token) is the
    * canonical word-count plan — partial aggregation combines map-side,
    * so the shuffle carries one row per (partition, token), not per
    * posting; top-k is TakeOrdered (per-partition heaps + driver merge
    * of k rows), never a global sort. At 100 TB this is the same plan,
    * just wider.
    */
  def vocabulary(df: DataFrame, textCol: String, k: Int = 100): DataFrame =
    df.select(explode(array_distinct(toks(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)

  /** PII patterns shared by the redaction and the oracle SQL: each is
    * valid and equivalent in both Java regex (Spark) and RE2 (DuckDB) —
    * no lookaround, no backreferences. Applied in order; replacement
    * tokens contain no digits or '@'/'.', so later patterns can never
    * match inside an earlier replacement.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+\\d[\\d-]{6,}\\d" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** PII redaction pass: replaces emails, phone numbers and IPv4
    * addresses with typed placeholders and emits per-document match
    * counts (`n_emails`, `n_phones`, `n_ips`) alongside the `redacted`
    * text. Pure regexp column expressions — narrow, codegen'd, runs at
    * scan speed; the patterns are the cross-engine subset so the DuckDB
    * oracle applies literally the same regexes.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val counted = df
      .withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(piiPatterns(0)._1), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(col(textCol), lit(piiPatterns(1)._1), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(col(textCol), lit(piiPatterns(2)._1), lit(0))))
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (pat, repl)) => regexp_replace(c, pat, repl)
    }
    counted.withColumn("redacted", redacted)
  }

  /** Stopword-voting language ID: per-language stopword hit counts,
    * argmax with first-profile tie-break. Returns `pred_lang` and
    * `lang_hits` (the winning count).
    */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val withCounts = langProfiles.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"hits_$lang", stopCount(t, words))
    }
    val best = greatest(langProfiles.map { case (l, _) => col(s"hits_$l") }: _*)
    // CASE WHEN hits_en = best THEN 'en' WHEN hits_es = best ... — ties
    // break to the first profile; oracle SQL mirrors the same CASE order.
    val pred = langProfiles.reverse.foldLeft(lit(null).cast("string")) {
      case (elseCol, (lang, _)) =>
        when(col(s"hits_$lang") === best, lit(lang)).otherwise(elseCol)
    }
    withCounts.withColumn("pred_lang", pred).withColumn("lang_hits", best)
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    * the public data-curation heuristics): fraction of token
    * occurrences that are repeats (`dup_token_frac`), fraction of
    * word-bigram occurrences that are repeats (`dup_bigram_frac`), and
    * the share of bigram slots taken by the single most frequent bigram
    * (`top_bigram_frac`) — high values flag boilerplate/spam documents
    * a curation pipeline drops. Pure higher-order array expressions —
    * narrow, no shuffle, runs at scan speed; per-doc cost is
    * O(tokens * distinct-bigrams), bounded by document length, not
    * corpus size. Rational arithmetic over exact counts (cross-engine
    * exact doubles).
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val n = size(t)
    val bg = zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val topCount = array_max(transform(array_distinct(bg),
      x => size(filter(bg, y => y === x))))
    df.withColumn("n_tokens", n)
      .withColumn("dup_token_frac",
        (n - size(array_distinct(t))).cast("double") / n)
      .withColumn("dup_bigram_frac",
        (size(bg) - size(array_distinct(bg))).cast("double") / size(bg))
      .withColumn("top_bigram_frac", topCount.cast("double") / size(bg))
  }

  /** BM25 keyword search over whitespace tokens: scores every document
    * against a bag of query `terms` and returns the global top `topK`
    * as (id, score, rank). Uses the rational-idf variant
    * `(N - df + 0.5) / (df + 0.5)` — the classic log() is monotone in
    * it, so ranking is BM25-faithful while every score stays a chain of
    * IEEE +,-,*,/ that any engine reproduces bit-identically (the
    * repo's oracle-exactness convention; transcendental libm calls are
    * the one thing DuckDB and the JVM may round differently).
    *
    * Scale shape: one tiny global aggregate (N, Σdl, per-term df — a
    * single row, broadcast back), then scoring is a narrow map over the
    * scan and top-k is TakeOrdered (per-partition heaps, k-row driver
    * merge) — never a global sort. The rank column is a window over
    * the k surviving rows only.
    */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tok = df.select(col(idCol), toks(col(textCol)).as("tk"))
      .withColumn("dl", size(col("tk")))
    val dfCols = terms.zipWithIndex.map { case (term, i) =>
      sum(when(array_contains(col("tk"), term), 1L).otherwise(0L)).as(s"df_$i")
    }
    val stats = tok.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("sum_dl") +: dfCols): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val score = terms.zipWithIndex.map { case (term, i) =>
      val tf = size(filter(col("tk"), y => y === term)).cast("double")
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    val top = tok.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol).asc)))
  }

  /** Corpus-trained bigram language-model score per document — the
    * CCNet/KenLM-style "how surprising is this text" quality signal,
    * self-trained on the corpus (no external model): add-one-smoothed
    * bigram probabilities
    * `P(w_i | w_{i-1}) = (C(w_{i-1} w_i) + 1) / (C(w_{i-1}) + V)`
    * with counts from the WHOLE input and V = corpus vocabulary size.
    * Output per doc (docs with ≥ 2 tokens): `n_bigrams`,
    * `logprob_micro` (Σ of per-bigram ln P quantized to integer
    * micro-nats — exact, associativity-free long arithmetic, the same
    * cross-engine determinism trick as [[classifierScore]]) and
    * `avg_logprob` (= logprob_micro / (1e6 · n_bigrams); higher = more
    * typical of the corpus; perplexity is `exp(-avg_logprob)`).
    *
    * Scale shape: count tables come from one groupBy over exploded
    * bigrams (map-side combined; c1 reuses c2 — no second pass); the
    * scoring join keys positions by (w1, w2) then w1 — fact-to-dim
    * joins where Zipf-head keys mean many FACT rows per key, which
    * sort-merge + AQE skew-split handles (the dim side stays one row
    * per key; broadcast when the vocab fits). V travels as a
    * broadcast one-row frame, never a driver collect.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = df.select(col(idCol).as("__id"), toks(col(textCol)).as("t"))
    val bg = t.where(size(col("t")) >= 2)
      .select(col("__id"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> struct(t[i] AS w1, t[i + 1] AS w2))")).as("g"))
      .select(col("__id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val v = t.select(explode(col("t")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("lp", round(log(
        (col("c2") + 1).cast("double") / (col("c1") + col("v")).cast("double")
      ) * 1e6).cast("long"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("logprob_micro"))
      .withColumn("avg_logprob", col("logprob_micro").cast("double") /
        (col("n_bigrams").cast("double") * 1e6))
      .select(col("__id").as(idCol), col("n_bigrams"), col("logprob_micro"),
        col("avg_logprob"))
  }

  /** Train a byte-pair-encoding merge table on a deterministic corpus
    * sample — classic BPE (Sennrich et al. 2016): start from characters,
    * repeatedly merge the most frequent adjacent symbol pair (ties break
    * lexicographically, so training is fully deterministic). The sample
    * is the `sampleDocs` rows with smallest xxhash64(text) — the same
    * bounded driver-side model-artifact contract as
    * [[VectorSearchOps.ivfTopK]]'s centroids: tokenizers are trained on
    * samples even at 100 TB; APPLICATION is the distributed part.
    *
    * Returns rank-ordered space-separated symbol pairs ("a b"), ready
    * for [[bpeTokenStats]].
    */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int = 200,
      sampleDocs: Int = 1000): Array[String] = {
    require(numMerges >= 1 && sampleDocs >= 1)
    // md5 (not xxhash64) orders the sample: both Spark and DuckDB hash
    // UTF-8 bytes to the same hex string, so the oracle replays the
    // sample selection exactly; ties are identical texts, so the sampled
    // multiset is deterministic either way
    val sample = df.select(col(textCol).as("t"))
      .withColumn("h", md5(col("t"))).orderBy("h").limit(sampleDocs)
      .select("t").collect().map(_.getString(0))
    val wordFreq = scala.collection.mutable.HashMap.empty[String, Long]
    sample.foreach(_.split(" ").foreach(w =>
      if (w.nonEmpty) wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1)))
    // words as symbol sequences
    var words: Array[(Array[String], Long)] =
      wordFreq.toArray.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = Array.newBuilder[String]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCount.update(k, pairCount.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pairCount.isEmpty) exhausted = true
      else {
        val (a, b) = pairCount.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += s"$a $b"
        words = words.map { case (syms, f) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Tokenizer-aware corpus accounting: BPE token count per document
    * under a trained merge table (plus the whitespace word count and the
    * compression ratio). Column-preserving; the merge table is a plan
    * constant, so this is a zero-shuffle narrow map — the real "how many
    * tokens will training see" number that whitespace counts only
    * approximate.
    */
  def bpeTokenStats(df: DataFrame, textCol: String,
      merges: Array[String]): DataFrame = {
    val t = toks(col(textCol))
    df.withColumn("n_words", size(t).cast("long"))
      .withColumn("n_bpe_tokens", graft.functions.GraftFunctions
        .bpeTokenCount(col(textCol), merges))
      .withColumn("bpe_per_word",
        col("n_bpe_tokens").cast("double") / col("n_words").cast("double"))
  }

  /** Canonical text normalization — the first stage of any ingest
    * pipeline, so exact/near dedup and hashing see one byte form:
    * Unicode NFC composition (é as one codepoint, not e+combining
    * accent), control characters stripped (C0 minus \t\n\r, plus DEL),
    * whitespace runs collapsed to single spaces, ends trimmed. Adds
    * `norm_text`; column-preserving (applies to a streaming frame
    * unchanged). Narrow, zero-shuffle; the regexes are codegen'd
    * built-ins and NFC is a native expression.
    *
    * The character classes are spelled as explicit ranges (never `\s` /
    * POSIX classes) so any engine replaying this contract — e.g. the
    * DuckDB oracle — agrees byte-for-byte.
    */
  def normalizeText(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("norm_text",
      trim(regexp_replace(
        regexp_replace(
          graft.functions.GraftFunctions.nfc(col(textCol)),
          "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
        "[ \\t\\n\\r]+", " ")))

  /** Hashed TF-IDF document vectors (the hashing trick): every token
    * lands in `pmod(md5-prefix, dim)`; bucket weight is
    * `tf · (ln((N + 1) / (df + 1)) + 1)` (smoothed idf — never zero or
    * negative), and the vector is L2-normalized `Array[Float]` — drop-in
    * compatible with [[graft.operators.VectorSearchOps]], so the whole
    * ANN / embedding-dedup tier runs on raw text with no external
    * embedding model.
    *
    * Scale shape: tf is a (doc, token) aggregate, df reuses it with a
    * second map-side-combined aggregate, N travels as one broadcast
    * row. Vector assembly is a per-doc aggregate whose state is ≤ dim
    * entries (bounded, no skew: docs hash uniformly). All exchanges key
    * on doc id or token — never on the vector.
    */
  def tfidfVectors(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 256): DataFrame = {
    require(dim >= 2 && dim <= 65536, s"dim must be in [2, 65536], got $dim")
    val t = df.select(col(idCol).as("__id"), toks(col(textCol)).as("t"))
    val tf = t.select(col("__id"), explode(col("t")).as("tok"))
      .groupBy("__id", "tok").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = t.agg(count(lit(1)).as("n_docs"))
    // conv() parses 8 hex chars (32 bits — sign-safe in a long)
    val bucket = pmod(
      conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"), lit(dim))
    val byBucket = tf.join(dfc, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("w", col("tf").cast("double") *
        (log((col("n_docs") + 1).cast("double") /
          (col("df") + 1).cast("double")) + 1.0))
      .groupBy(col("__id"), bucket.as("b")).agg(sum("w").as("w"))
    // two collect_lists in one aggregate see rows in the same order, so
    // the entry arrays stay aligned; the densify+normalize is a native
    // one-pass kernel (the HOF formulation — transform over a sequence
    // with per-index map lookups — interpreted its lambdas and cost ~20 s
    // at sf0.1; the kernel is sub-second)
    byBucket.groupBy("__id")
      .agg(collect_list(col("b")).as("bs"), collect_list(col("w")).as("ws"))
      .select(col("__id").as(idCol),
        graft.functions.GraftFunctions.denseNormalize(
          col("bs"), col("ws"), dim).as("tfidf"))
  }

  /** Exact-arithmetic sparse TF-IDF cosine top-k — the oracle-able twin
    * of the float-kernel ANN path ([[tfidfVectors]] +
    * [[VectorSearchOps.bruteForceTopK]]): idf quantizes to integer
    * 1e-4-nat units (the [[bigramLmScore]] trick), so bucket weights,
    * norms and dot products are associativity-free long arithmetic and
    * the final cosine is the same IEEE division on any engine —
    * hash-comparable against a SQL replay, not just rows-counted.
    *
    * Scale shape: tf/df are map-side-combined aggregates keyed on
    * (doc, token) / token; the query side (ids < `queryMaxId`) is a
    * broadcast sparse matrix of ≤ `dim` entries per query, so the
    * corpus never shuffles for the dot products — one narrow join on
    * the bucket id then a (q_id, doc) partial aggregate. Top-k is a
    * per-query WindowGroupLimit.
    *
    * Bound check for the longs: with quantized idf ≤ ~8e4·(1+ln N) and
    * per-doc token counts in the thousands, weights stay ≤ ~1e8,
    * squares ≤ ~1e16, and 256-bucket sums ≤ ~2.6e18 < 2^63.
    */
  def tfidfCosineTopK(df: DataFrame, idCol: String, textCol: String,
      queryMaxId: Long, k: Int, dim: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quant = 10000.0
    val t = df.select(col(idCol).as("__id"), toks(col(textCol)).as("t"))
    val tf = t.select(col("__id"), explode(col("t")).as("tok"))
      .groupBy("__id", "tok").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = t.agg(count(lit(1)).as("n_docs"))
    val bucket = pmod(
      conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"), lit(dim))
    val sparse = tf.join(dfc, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("wq", col("tf") *
        round((log((col("n_docs") + 1).cast("double") /
          (col("df") + 1).cast("double")) + 1.0) * quant).cast("long"))
      .groupBy(col("__id"), bucket.as("b"))
      .agg(sum("wq").cast("long").as("w"))
    val norms = sparse.groupBy("__id")
      .agg(sqrt(sum(col("w") * col("w")).cast("long").cast("double")).as("nrm"))
    val qs = sparse.filter(col("__id") < queryMaxId)
      .select(col("__id").as("q_id"), col("b"), col("w").as("qw"))
    val qn = norms.filter(col("__id") < queryMaxId)
      .select(col("__id").as("q_id"), col("nrm").as("qn"))
    val dots = sparse.join(broadcast(qs), Seq("b"))
      .groupBy("q_id", "__id")
      .agg(sum(col("w") * col("qw")).cast("long").as("dot"))
    val scored = dots.join(norms, Seq("__id")).join(broadcast(qn), Seq("q_id"))
      .withColumn("cos", col("dot").cast("double") / (col("qn") * col("nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("__id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("__id").as("nbr_id"), col("cos"))
  }
}
