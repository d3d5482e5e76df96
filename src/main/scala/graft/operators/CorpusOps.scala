package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines:
  * deterministic splits and deterministic global shuffles. No reference
  * analogue (the reference stores metrics) — extension tier from the
  * brief, shaped for the 100 TB case.
  *
  * Both operators key on a cryptographic digest of the id (md5), not on
  * row order or a random() call: assignments are reproducible across
  * runs, engines and cluster sizes, independent of partitioning, and
  * stable under corpus growth (adding documents never reassigns
  * existing ones — the property that keeps train/holdout contamination-
  * free across dataset versions).
  */
object CorpusOps {

  /** Hex md5 of the id (salted), the portable sort/assignment key:
    * identical strings in any engine with md5 (Spark, DuckDB, Postgres).
    */
  private def hashKey(idCol: Column, salt: String): Column =
    md5(concat(idCol.cast("string"), lit(salt)))

  /** Fixed-size overlapping token-window chunking — the RAG /
    * context-window document splitter: each document's token stream
    * (single-space tokenization, the corpus convention) emits windows of
    * `chunkTokens` tokens starting every `chunkTokens - overlapTokens`
    * tokens; a non-first window of length ≤ `overlapTokens` is fully
    * contained in its predecessor and is not emitted. Deterministic
    * from the text alone — no row order, no randomness.
    *
    * Output: idCol, `chunk_id` (0-based window ordinal), `chunk_text`,
    * `n_tokens` (≤ chunkTokens; the tail window may be shorter).
    *
    * 100 TB: narrow (split → sequence → explode, all codegen'd — no
    * shuffle, no state); chunking parallelizes per input split and
    * composes with [[packBins]] / dedup downstream. NULL text rows drop
    * (no token stream), like the rest of the text tier.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens > 0 && overlapTokens >= 0 &&
      overlapTokens < chunkTokens, "need 0 <= overlapTokens < chunkTokens")
    val step = chunkTokens - overlapTokens
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // NULL text must yield NO starts: greatest() SKIPS nulls (a null n
    // would otherwise fall back to one start at 0), so gate explicitly —
    // explode(null) drops the row
    val starts = when(n.isNotNull, filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(step)),
      s => s === 0 || (n - s) > overlapTokens))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"),
        explode(starts).as("__s"))
      .select(col(idCol),
        (col("__s") / step).cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__s") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("__s")).cast("long")
          .as("n_tokens"))
  }

  /** Assign each row to "train" or "holdout" with P(train) ~ trainFrac,
    * deterministically from the id: train iff the first 8 hex digits of
    * md5(id || salt) — a uniform 32-bit value — fall below
    * floor(trainFrac * 2^32). Lexicographic hex compare == numeric
    * compare (fixed width, lowercase), so the predicate is a plain
    * string comparison any engine evaluates identically. Narrow (no
    * shuffle); at 100 TB this is a map over the scan.
    */
  def hashSplit(df: DataFrame, idCol: String, trainFrac: Double,
      salt: String = ""): DataFrame = {
    require(trainFrac > 0.0 && trainFrac < 1.0, "trainFrac must be in (0, 1)")
    val threshold = f"${math.floor(trainFrac * 4294967296.0).toLong}%08x"
    df.withColumn("split",
      when(substring(hashKey(col(idCol), salt), 1, 8) < lit(threshold), "train")
        .otherwise("holdout"))
  }

  /** Stratified downsampling with per-stratum keep rates: row kept iff
    * the uniform 32-bit value from md5(id || salt) falls below its
    * stratum's threshold. The classic corpus-rebalance op (downsample
    * the dominant language/source); deterministic from the id like
    * [[hashSplit]], so resampling a grown corpus never flips an
    * existing row's fate. Narrow (no shuffle) — the rate table compiles
    * to a CASE expression, never a join, so at 100 TB this is a map
    * over the scan and the filter is codegen'd.
    *
    * Rates must be in (0, 1]; a stratum at 1.0 is kept wholesale
    * (the compare is `< "ffffffff".next`, i.e. always true, expressed
    * as no filter). Unlisted strata use `defaultFrac`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultFrac: Double = 1.0,
      salt: String = ""): DataFrame = {
    require((rates.values ++ Seq(defaultFrac)).forall(r => r > 0.0 && r <= 1.0),
      "rates must be in (0, 1]")
    def hex(frac: Double): String =
      f"${math.floor(frac * 4294967296.0).toLong.min(4294967295L)}%08x"
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(hex(defaultFrac))) {
      case (elseCol, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit(hex(frac))).otherwise(elseCol)
    }
    df.filter(substring(hashKey(col(idCol), salt), 1, 8) <= threshold)
  }

  /** Canonical-survivor selection: keep exactly one row per group — the
    * one with the largest `weightCol`, ties broken by smallest `idCol`
    * (total order, so the survivor is deterministic). The standard final
    * step of near-dup resolution: cluster with
    * [[GraphOps.connectedComponents]], then keep each cluster's best
    * document. One shuffle on the group key; the rank filter is a
    * running window (no buffering beyond the frame row), so groups of
    * any size stream through.
    */
  def canonicalPerGroup(df: DataFrame, groupCol: String, weightCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(weightCol).desc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }

  /** Deterministic global shuffle: order the corpus by md5(id || seed).
    * Changing the seed gives an independent permutation; the same seed
    * always gives the same one. The output carries the sort key so
    * downstream stages can range-partition on it — at 100 TB the
    * "shuffle" is a sort-write (Spark range partitions the sort), never
    * a driver-side permutation.
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: String = "0"): DataFrame =
    df.withColumn("shuffle_key", hashKey(col(idCol), seed))
      .orderBy("shuffle_key")

  /** Temperature-flattened stratum mixing — the multi-source rebalance
    * every LLM corpus assembly runs (sample sources ∝ n^(1/T) instead of
    * raw size, so the dominant crawl doesn't drown the small curated
    * sets). Keep rate r_i = (n_min / n_i)^(1 - 1/T): effective counts
    * scale as n_i^(1/T) — T=1 is the natural distribution, T→∞
    * approaches uniform — and the smallest stratum is kept wholesale
    * (rates normalize to max 1; flattening never upsamples). The keep
    * decision reuses [[hashSplit]]'s md5-threshold scheme, so membership
    * is deterministic from the id given the stratum rate; unlike
    * [[stratifiedSample]] the rates here DERIVE from stratum counts, so
    * regrowing the corpus re-derives them (documented trade: adaptive
    * rates vs growth-stable membership — pass fixed rates to
    * stratifiedSample when the latter matters).
    *
    * T=2 (the common "square-root sampling") uses `sqrt`, which IEEE
    * requires correctly rounded — thresholds are bit-identical across
    * engines; other T go through `pow` (last-ulp divergence possible at
    * a 1-in-2^32 threshold boundary).
    *
    * Scale shape: one tiny stratum-count aggregate (|strata| rows)
    * broadcast back onto the corpus — the corpus itself is never
    * shuffled; the filter is a codegen'd narrow map over the scan.
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      temperature: Double = 2.0, salt: String = "mix"): DataFrame = {
    require(temperature >= 1.0, "temperature must be >= 1 (downsample-only)")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_stratum"))
    val nMin = counts.agg(min(col("n_stratum")).as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_stratum").cast("double")
    val rate =
      if (temperature == 2.0) sqrt(ratio)
      else pow(ratio, 1.0 - 1.0 / temperature)
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("keep_rate", rate)
      .withColumn("__thr", format_string("%08x",
        least(floor(col("keep_rate") * 4294967296.0), lit(4294967295L))
          .cast("long")))
      .select(col(strataCol), col("n_stratum"), col("keep_rate"), col("__thr"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(substring(hashKey(col(idCol), salt), 1, 8) <= col("__thr"))
      .drop("__thr")
  }

  /** Token-budget sequence packing: assign each document to a training
    * bin of ~`budget` tokens. Documents are dealt into `16^groupChars`
    * independent groups by the leading hex of md5(id || salt), ordered
    * within the group by the full hash (a deterministic shuffle), and
    * cut greedily: a doc opens a new bin when the running token total
    * before it crosses a multiple of `budget`. Output adds `grp`,
    * `cum_before` (tokens ahead of this doc in its group) and `bin`
    * (the pack id within the group; `(grp, bin)` is globally unique).
    *
    * Scale shape: packing is inherently sequential, so the global
    * sequence is sharded — each group packs independently under one
    * window (one range-partitioned sort, no global single-partition
    * scan). `groupChars` tunes parallelism: 1 → 16 groups (test scale),
    * 2 → 256, 3 → 4096 (cluster scale). Deterministic from ids alone:
    * regrowing the corpus never reorders existing groups' prefixes that
    * hash-sort earlier, and any engine with md5 reproduces the exact
    * assignment.
    */
  def packBins(df: DataFrame, idCol: String, tokensCol: String,
      budget: Int, groupChars: Int = 1, salt: String = "pack"): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(groupChars >= 1 && groupChars <= 8, "groupChars must be in [1, 8]")
    val w = Window.partitionBy(col("grp")).orderBy(col("pack_key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_key", hashKey(col(idCol), salt))
      .withColumn("grp", substring(col("pack_key"), 1, groupChars))
      .withColumn("cum_before",
        coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before").cast("double") / budget))
  }

  /** DSIR-style importance selection (Xie et al. 2023, *Data Selection
    * via Importance Resampling*): score every raw document by how much
    * its hashed-unigram distribution looks like a TARGET corpus —
    * `logw = Σ_tokens [ln p_target(b(tok)) − ln p_raw(b(tok))]` over the
    * 256 hex-pair md5 buckets ([[TextAnalysisOps.classifierScore]]'s
    * feature space), add-one smoothed — and keep the top `k`.
    * Per-token log ratios quantize to integer micro-nats, so document
    * sums are exact long arithmetic under any partitioning.
    *
    * With `gumbel = true` the rank key adds deterministic Gumbel noise
    * `-ln(-ln(u))`, `u` from md5(id ‖ salt) — the paper's importance
    * RESAMPLING (softmax sampling without replacement via Gumbel
    * top-k) rather than hard top-k; same determinism contract as
    * [[hashSplit]].
    *
    * Scale shape: the two 256-bucket histograms are driver-collected
    * model artifacts (like [[VectorSearchOps.ivfTopK]]'s centroids) that
    * compile into a literal lookup map, so scoring is a narrow,
    * zero-shuffle map over the raw corpus; top-k is TakeOrdered
    * (per-partition heaps), never a global sort.
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, gumbel: Boolean = false,
      salt: String = "dsir"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def hist(df: DataFrame): Map[String, Long] = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(substring(md5(col("tok")), 1, 2).as("b")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tHist = hist(target)
    val rHist = hist(raw)
    val tTot = (tHist.values.sum + 256).toDouble
    val rTot = (rHist.values.sum + 256).toDouble
    val buckets = (0 until 256).map(i => f"$i%02x")
    val lrMicro: Seq[(String, Long)] = buckets.map { b =>
      val lt = math.log((tHist.getOrElse(b, 0L) + 1).toDouble / tTot)
      val lq = math.log((rHist.getOrElse(b, 0L) + 1).toDouble / rTot)
      b -> math.rint((lt - lq) * 1e6).toLong
    }
    val lrMap = map(lrMicro.flatMap { case (b, v) =>
      Seq(lit(b), lit(v)) }.toIndexedSeq: _*)
    val toks = split(col(textCol), " ")
    val logw = aggregate(toks, lit(0L),
      (acc, tk) => acc + element_at(lrMap, substring(md5(tk), 1, 2)))
    val scored = raw
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("logw_micro", logw)
    val key =
      if (!gumbel) col("logw_micro").cast("double")
      else {
        // uniform (0,1) from 52 md5 bits; u=0 has P=2^-52 and maps to
        // -inf (never selected) — harmless
        val u = conv(substring(md5(concat(col(idCol).cast("string"),
          lit(salt))), 1, 13), 16, 10).cast("double") / lit(4503599627370496.0)
        col("logw_micro").cast("double") / 1e6 - log(-log(u))
      }
    scored.withColumn("__key", key)
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("n_tokens"), col("logw_micro"))
  }

  /** Precision/recall sweep for choosing a quality-gate threshold:
    * bucket scores into `bins` equal-width bins over [lo, hi] (outliers
    * clamp to the edge bins), then treat each bin's lower edge as a
    * candidate threshold t and report, for the "keep everything with
    * score >= t" policy: kept count, true positives, precision and
    * recall against a boolean label.
    *
    * One corpus aggregation (per-bin integer counts, map-side combined)
    * plus running sums over the bins-row result — no per-threshold
    * corpus rescan. All counts are exact integers; precision/recall are
    * single divisions of those integers, so the output is engine- and
    * partitioning-invariant for any deterministic score.
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "need hi > lo")
    val width = (hi - lo) / bins
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((col(scoreCol) - lit(lo)) / lit(width)).cast("long")))
    val perBin = df
      .select(bin.as("bin"), col(labelCol).cast("boolean")
        .cast("int").cast("long").as("pos"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
    val fromTop = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBin
      .withColumn("threshold", lit(lo) + col("bin").cast("double") * lit(width))
      .withColumn("kept", sum(col("n")).over(fromTop))
      .withColumn("tp", sum(col("n_pos")).over(fromTop))
      .withColumn("total_pos", sum(col("n_pos")).over(whole))
      .withColumn("precision", col("tp").cast("double") / col("kept").cast("double"))
      .withColumn("recall", col("tp").cast("double") / col("total_pos").cast("double"))
      .select("bin", "threshold", "kept", "tp", "total_pos", "precision", "recall")
  }
}
