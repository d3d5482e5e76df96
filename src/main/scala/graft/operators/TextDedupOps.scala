package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.GraftFunctions

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline tier. The reference engine has no analogue
  * (it stores metrics, not documents); these are first-class extensions
  * per the build brief.
  *
  * Scale design (100 TB stance):
  *  - Exact dedup is a single hash-groupBy — one shuffle on a 128-bit
  *    content hash, no skew (hashes are uniform).
  *  - Near-dup never goes all-pairs: candidates come from *equi-join
  *    keys* (MinHash band hashes, SimHash bands, length buckets), so the
  *    planner gets a shuffle-hash/sort-merge join on a compact key, and
  *    the quadratic blow-up is confined to within-bucket candidate pairs.
  *  - Verification (exact Jaccard on shingle arrays) runs only on
  *    candidate pairs — a narrow map over the join output.
  *  - All hashing is codegen'd native expressions (graft.functions), no
  *    UDF boxing on the per-token hot path.
  */
object TextDedupOps {

  /** Distinct word-`k`-gram shingles of a whitespace-tokenized text
    * column. Texts shorter than `k` tokens produce their single
    * (shorter) shingle, never zero rows.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** Exact Jaccard similarity of two (already-distinct) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Shingles pre-hashed to 64-bit longs (one-pass native kernel — no
    * token/shingle string materialization; profiling at sf0.1 showed the
    * built-in split→slice→concat→distinct→hash chain costing ~1 ms/doc,
    * >10x the joins it fed). Intersection/union *sizes* (all Jaccard
    * needs) are preserved short of a 64-bit collision between two
    * distinct shingles of a compared pair (~1e-15 per pair); long-array
    * set ops hash fixed-width words instead of UTF-8 strings, which is
    * most of the pairwise-verification cost at scale.
    */
  def hashedShingles(text: Column, k: Int = 3): Column =
    GraftFunctions.shingleHashes(text, k)

  /** Exact dedup by content hash: one row per distinct `textCol` value,
    * keeping the minimum `idCol` and the copy count. Single shuffle.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact near-dup pairs by word-`k`-gram Jaccard >= `threshold`, via
    * an inverted shingle index (the all-pairs-similarity shape): explode
    * (doc, shingle) postings, self-equi-join on the shingle, count
    * shared shingles per pair — that count IS |A∩B|, and with per-doc
    * sizes carried along, J = c / (|A|+|B|-c). Pairs sharing no shingle
    * never materialize (their J is 0 by definition), so this is exact
    * over ALL pairs while doing no array set-ops and shuffling only
    * fixed-width rows. The explicit repartition on the join key makes
    * the two self-join branches end in the same Exchange, so
    * ReuseExchange computes the shingle pipeline once.
    *
    * Cost concentrates on high-document-frequency shingles: a shingle
    * in f docs emits f^2 pair rows, so corpus-wide boilerplate ("terms
    * of service apply") turns the self-join quadratic. `maxDf` is the
    * prefix-filtering guard: shingles with df > maxDf are dropped from
    * the posting join, bounding any shingle's pair-row contribution at
    * maxDf^2. Emitted Jaccard values remain EXACT — each doc's (tiny,
    * <= #hot-shingles) set of dropped shingles is carried on the side
    * and its per-pair intersection restored before the threshold filter.
    * The one semantic gap, documented and deliberate: a pair sharing
    * ONLY above-cap shingles is never considered (at maxDf=1000 such
    * pairs are boilerplate clusters, the territory of [[exactDedup]]).
    * The df aggregate rides the posting Exchange (map-side partial agg,
    * no extra shuffle); join strategies for the small hot-shingle frames
    * are left to AQE.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5, maxDf: Int = 1000): DataFrame = {
    require(maxDf > 0, "maxDf must be positive")
    val docs = df.select(col(idCol).as("id"), hashedShingles(col(textCol), k).as("sh"))
      .select(col("id"), col("sh"), size(col("sh")).as("n"))
    val posts = docs.select(col("id"), col("n"), explode(col("sh")).as("g"))
      .repartition(col("g"))
    val hot = posts.groupBy(col("g")).agg(count(lit(1)).as("df_g"))
      .filter(col("df_g") > maxDf).select(col("g"))
    val hotPerDoc = posts.join(hot, Seq("g"))
      .groupBy(col("id")).agg(collect_list(col("g")).as("hot_sh"))
    val capped = posts.join(hot, Seq("g"), "left_anti")
    // size filter (AllPairs/PPJoin): J >= t forces
    // min(|A|,|B|) >= t * max(|A|,|B|) — since |A∩B| <= min and
    // J <= min/max — so size-incompatible pairs are pruned AT the join,
    // before they ever reach the pair aggregate. Exact: no qualifying
    // pair can violate the bound.
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
        col("a.n") >= col("b.n") * threshold &&
        col("b.n") >= col("a.n") * threshold)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("c_cap"))
    val emptyHot = array().cast("array<bigint>")
    pairs
      .join(hotPerDoc.select(col("id").as("id_a"), col("hot_sh").as("hot_a")),
        Seq("id_a"), "left")
      .join(hotPerDoc.select(col("id").as("id_b"), col("hot_sh").as("hot_b")),
        Seq("id_b"), "left")
      .withColumn("c", col("c_cap") + size(array_intersect(
        coalesce(col("hot_a"), emptyHot), coalesce(col("hot_b"), emptyHot))))
      .withColumn("jac", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** MinHash + LSH near-dup pairs: shingle -> 128-hash MinHash signature
    * -> `bands` band hashes -> equi-self-join on (band, bandHash) ->
    * distinct candidate pairs -> exact-Jaccard verification >= threshold.
    *
    * With numHashes=128, bands=32 (rows r=4), a pair at Jaccard 0.9 is
    * missed with probability (1 - 0.9^4)^32 ~ 1e-15, while a pair at 0.1
    * produces a spurious candidate with probability ~32e-4 — which the
    * exact verification then discards. Output matches
    * [[ngramJaccardPairs]] wherever LSH recall is 1.
    */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // hash shingles once; MinHash consumes the pre-hashed longs
    // (bit-identical to hashing the shingle strings — see HashImpl)
    val sig = df.select(col(idCol).as("id"),
      GraftFunctions.minhash(hashedShingles(col(textCol), k), numHashes, seed)
        .as("sig"))
    // one row per (doc, band): band hash = xxhash64 over the band's
    // slice. Banded rows are FIXED-WIDTH (id, band, band_hash) — the
    // shingle arrays deliberately do not ride the bands-per-doc explode,
    // which would amplify the per-doc array bytes x bands through the
    // candidate shuffle (measured ~2x the whole query's runtime at
    // sf0.1, and GBs/doc-KB at corpus scale).
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    // repartition both sides on the join key: the self-join branches
    // become byte-identical subplans ending in the same Exchange, so
    // ReuseExchange computes the signature pipeline ONCE and replays it
    // for the other side (a broadcast join would re-run it)
    val keyed = banded.repartition(col("band"), col("band_hash"))
    // candidates FIRST: a pair matching in m bands collapses to one row
    // while still fixed-width, so the distinct shuffles 16-byte rows and
    // exact-Jaccard verification runs once per candidate pair (not once
    // per matching band)
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // verify: join the shingle arrays back for just the candidate pairs
    // (two joins against the corpus keyed by id — linear in corpus size,
    // vs. bands-x-array-bytes through the band shuffle)
    val sh = df.select(col(idCol).as("id"), hashedShingles(col(textCol), k).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit SimHash over shingles, candidates
    * via a combination-of-blocks band equi-join, verified by
    * Hamming <= maxHamming.
    *
    * Candidate keys are the C(8,2) = 28 ordered PAIRS of the hash's 8
    * 8-bit blocks, each a 16-bit value — 28 x 2^16 ~ 1.8M possible
    * buckets. (Single 8-bit blocks — the naive banding — give only
    * 8 x 2^8 = 2,048 buckets TOTAL, independent of corpus size, which
    * degenerates to O(n^2/256) candidate pairs at scale.) Pigeonhole on
    * pairs-of-blocks guarantees full recall to Hamming 6: <= 6 flipped
    * bits leave >= 2 of the 8 blocks untouched, and that block pair is a
    * matching key. For Hamming 7..maxHamming a pair is found iff >= 2
    * blocks are untouched — near-certain for real near-dups, whose
    * flipped bits come from a few changed shingles and cluster
    * accordingly.
    *
    * `bucketCap` drops candidate buckets holding more than that many
    * docs before the self-join: a bucket of f docs emits O(f^2) pair
    * rows, and buckets that hot at a 1.8M-key space are boilerplate
    * clusters better handled by [[exactDedup]] first. The cap bounds
    * per-bucket work at cap^2 regardless of corpus size; the hot-key
    * count rides the same Exchange as the self-join (one extra map-side
    * partial aggregate, no extra shuffle).
    */
  def simhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, maxHamming: Int = 10, bucketCap: Int = 100000): DataFrame = {
    require(maxHamming <= 12,
      "verification threshold far above the pairs-of-blocks recall guarantee (Hamming 6)")
    require(bucketCap > 0, "bucketCap must be positive")
    val docs = df.select(col(idCol).as("id"),
      GraftFunctions.simhash(hashedShingles(col(textCol), k)).as("sim"))
    def block(b: Int): Column =
      call_function("shiftrightunsigned", col("sim"), lit(b * 8))
        .bitwiseAND(lit(0xFFL))
    val blockPairs = for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j)
    val banded = docs.select(col("id"), col("sim"),
      posexplode(array(blockPairs.map { case (i, j) =>
        shiftleft(block(i), 8).bitwiseOR(block(j)) }: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_bits")
    // filter on Hamming before the distinct so the dedup shuffle only
    // ever sees surviving (rare) pairs; repartition-keyed self-join →
    // ReuseExchange computes the simhash pipeline once (see minhash)
    val keyed = banded.repartition(col("band"), col("band_bits"))
    val hot = keyed.groupBy(col("band"), col("band_bits"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > bucketCap)
      .select(col("band"), col("band_bits"))
    val capped = keyed.join(broadcast(hot), Seq("band", "band_bits"), "left_anti")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_bits") === col("b.band_bits") &&
        col("a.id") < col("b.id"))
      .filter(GraftFunctions.hamming64(col("a.sim"), col("b.sim")) <= maxHamming)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Embedding near-dup pairs: exact cosine >= threshold over all pairs,
    * computed as a BLOCKED nested-loop — vectors are packed into
    * ~`blockSize`-row blocks (one corpus shuffle), unordered block pairs
    * are enumerated, and a native GEMM-shaped kernel scores each block
    * pair in one call ([[graft.functions.CosinePairsAbove]]).
    *
    * Why not LSH-block? Measured on this corpus the embeddings are pure
    * noise (pairwise cosine is a 0-centered bell; matches are the >=
    * threshold tail, θ≈63°) — hyperplane LSH at that angle either misses
    * tail pairs or probes more pairs than brute force, so for an *exact*
    * contract the blocked kernel IS the scale path: quadratic in pairs
    * (inherent to exactness at a threshold inside the noise bulk) but
    * with per-pair cost reduced to `dim` fused multiply-adds on flat
    * doubles, no per-pair join-row materialization (two copied vectors
    * per row — the dominant cost of the naive self-join, ~3x slower at
    * sf0.1). Corpora with genuine near-dup structure (matches at cosine
    * >= ~0.8) should use [[VectorSearchOps.lshCandidates]] blocking
    * instead and verify exactly.
    */
  def embeddingDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numBlocks: Int = 0,
      maxInputBytes: Long = 4L << 30): DataFrame = {
    val idType = df.schema(idCol).dataType // integral; restored on output
    // the kernel carries ids as longs; a silent cast of string/decimal
    // ids would null them out and DROP their pairs — reject instead
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"embeddingDedupPairs needs an integral id column; $idCol is $idType")
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // LOUD scale guard: the exact-threshold contract is quadratic in
    // pairs BY NATURE (see above) — acceptable on a bounded slice,
    // catastrophic if reached by its obvious name on a corpus-sized
    // frame (4 GiB of 768-dim doubles ≈ 700k vectors ≈ 2.4e11 dots;
    // every doubling quadruples it). Refuse beyond `maxInputBytes`
    // (plan-time size estimate, no job) with the scale paths named;
    // pass 0 to disable when the quadratic cost is a considered choice.
    if (maxInputBytes > 0) {
      val bytes = v.queryExecution.optimizedPlan.stats.sizeInBytes
      // stats can be UNKNOWN (RDD-backed / local-relation-free plans
      // fall back to spark.sql.defaultSizeInBytes = Long.MaxValue): a
      // small valid input must not be spuriously refused on a missing
      // estimate — skip the guard with a warning instead; the refusal
      // fires only on a REAL over-threshold estimate
      // the sentinel comparison must not become a bypass: if the user
      // has LOWERED defaultSizeInBytes (a common broadcast-tuning
      // change), a genuinely enormous well-estimated input would read
      // as ">= sentinel" and skip the guard exactly in the regime it
      // exists for — so only treat the estimate as unknown when it
      // EQUALS the conf sentinel, or when the conf still sits at its
      // Long.MaxValue default and the estimate is at/above it
      val confDefault = BigInt(
        df.sparkSession.sessionState.conf.defaultSizeInBytes)
      val statsUnknown = bytes == confDefault ||
        (confDefault == BigInt(Long.MaxValue) && bytes >= confDefault)
      if (statsUnknown)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          "embeddingDedupPairs: input size estimate unavailable " +
            "(plan reports the defaultSizeInBytes sentinel) — the " +
            s"$maxInputBytes-byte quadratic-scale guard cannot apply; " +
            "proceeding. Materialize the input (e.g. write it to " +
            "parquet) to restore the guard")
      if (!statsUnknown) require(bytes <= BigInt(maxInputBytes),
        s"embeddingDedupPairs is EXACT all-pairs (quadratic by " +
          s"contract) and the input is ~$bytes bytes (> $maxInputBytes)" +
          " — at corpus scale use SemanticDedupOps.semanticDedup " +
          "(sampled k-means blocking) or VectorSearchOps.lshCandidates " +
          "+ exact verify; pass maxInputBytes = 0 to force the " +
          "quadratic run deliberately")
    }
    // Block count is a pure parallelism/memory knob — every unordered
    // block pair is enumerated, so the OUTPUT is identical for any
    // value. When the caller doesn't pass one, derive it from the
    // optimizer's size estimate (plan-time, no job — the previous
    // `v.count()` here fired an extra Spark job per invocation):
    // one block per ~32 MB of input, floor 16 so small inputs still
    // spread across a local[32] box, cap 4096 so the block-pair count
    // (nBlocks^2/2) stays bounded.
    val nBlocks =
      if (numBlocks > 0) numBlocks
      else {
        val bytes = v.queryExecution.optimizedPlan.stats.sizeInBytes
        math.min(4096L, math.max(16L, (bytes / (32L << 20)).toLong)).toInt
      }
    val blocks = v.groupBy(pmod(xxhash64(col("id")), lit(nBlocks)).as("blk"))
      .agg(collect_list(struct(col("id"), col("v"))).as("items"))
    // kernel threshold is backed off by 1e-6 so pairs that ROUND up to
    // the threshold at 6 decimals survive to the outer rounded filter
    // (matches the round-then-compare contract of the naive form)
    blocks.as("a").join(blocks.as("b"), col("a.blk") <= col("b.blk"))
      .select(explode(GraftFunctions.cosinePairs(
        col("a.items"), col("b.items"),
        col("a.blk") === col("b.blk"), threshold - 1e-6)).as("p"))
      .select(col("p.id_a").cast(idType).as("id_a"),
        col("p.id_b").cast(idType).as("id_b"),
        round(col("p.cos"), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The naive all-pairs self-join form of [[embeddingDedupPairs]] —
    * kept as the recall/equivalence baseline for tests.
    */
  def embeddingDedupPairsNaive(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(GraftFunctions.cosine(col("a.v"), col("b.v")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Benchmark-contamination detection: for every corpus document, the
    * word-`k`-gram overlap with each benchmark (eval-set) document,
    * emitting pairs whose shared-shingle fraction of the BENCHMARK
    * document reaches `minFrac` — the "eval set leaked into training
    * data" check every LLM pipeline runs before training. The fraction
    * is measured against the benchmark side (|C∩B| / |B|), so a short
    * eval prompt embedded verbatim in a long crawl document still
    * scores 1.0.
    *
    * Scale shape: the benchmark is the small side by construction
    * (eval sets are 1e3-1e5 docs vs a 100 TB corpus), so its exploded
    * shingle postings are broadcast — the corpus side stays a narrow
    * scan + explode with NO shuffle of corpus bytes; the only exchange
    * is the partial-aggregated (doc, bench) overlap counts, bounded by
    * actual collisions, not corpus size. Shingles are 64-bit hashes
    * ([[hashedShingles]]): intersection COUNTS are preserved short of a
    * 64-bit collision within a compared pair (~1e-15), and fixed-width
    * longs broadcast ~10x smaller than shingle strings.
    */
  def crossCorpusOverlap(corpus: DataFrame, bench: DataFrame,
      corpusIdCol: String, benchIdCol: String, textCol: String,
      k: Int = 3, minFrac: Double = 0.8): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0, "minFrac must be in (0, 1]")
    val c = corpus.select(col(corpusIdCol).as("doc_id"),
      explode(hashedShingles(col(textCol), k)).as("g"))
    val b = bench.select(col(benchIdCol).as("bench_id"),
        hashedShingles(col(textCol), k).as("s"))
      .select(col("bench_id"), size(col("s")).as("bench_n"),
        explode(col("s")).as("g"))
    c.join(broadcast(b), Seq("g"))
      .groupBy(col("doc_id"), col("bench_id"), col("bench_n"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("frac", col("n_common").cast("double") / col("bench_n"))
      .filter(col("frac") >= minFrac)
      .select(col("doc_id"), col("bench_id"), col("n_common"), col("frac"))
  }

  /** Exact duplicated-passage statistics (substring-level dedup, the
    * "train on each passage once" signal of Lee et al., *Deduplicating
    * Training Data Makes Language Models Better*): for every doc, how
    * much of it is covered by k-token passages that also occur in at
    * least `minDocs - 1` OTHER documents. A passage repeated only
    * within one document is NOT counted (self-repetition is
    * [[graft.operators.TextAnalysisOps.repetitionStats]]'s job).
    *
    * Output (docs with ≥1 cross-doc duplicated k-gram only):
    * `(idCol, n_tokens, dup_grams, covered_tokens, dup_fraction)` where
    * `covered_tokens` is the union length of all duplicated [pos,
    * pos+k) intervals — computed as Σ min(k, pos_i − pos_{i−1}) over
    * sorted positions, a window recurrence rather than an interval
    * merge, so it stays a codegen'd window + partial aggregate.
    *
    * Scale shape: positional k-grams are keyed by `unhex(md5(gram))`
    * (16 uniform bytes — collision-free in practice at any corpus
    * size, and the gram string never crosses the shuffle). Doc
    * frequency is a distinct-pairs aggregate with map-side combine;
    * the positions join back on the hash (shuffle-hash, no skew: a
    * gram's row count is its df, and the df side was already capped to
    * distinct docs). The per-doc window and final aggregate share one
    * exchange on the doc id. The corpus is scanned twice (df branch +
    * positions branch) — both narrow, nothing cached.
    */
  def passageDupStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    require(k >= 2, "passage length k must be >= 2 tokens")
    require(minDocs >= 2, "minDocs must be >= 2 (cross-doc duplication)")
    import org.apache.spark.sql.expressions.Window
    val sh = df
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("t"))
      .where(size(col("t")) >= k)
      .select(col("__id"), size(col("t")).cast("long").as("n_tokens"),
        posexplode(expr(
          s"transform(sequence(0, size(t) - $k), " +
            s"i -> unhex(md5(concat_ws(' ', slice(t, i + 1, $k)))))"))
          .as(Seq("pos", "h")))
    val dup = sh.select("h", "__id").distinct()
      .groupBy("h").count().where(col("count") >= minDocs)
      .select("h")
    val marked = sh.join(dup, Seq("h")).select("__id", "n_tokens", "pos")
    val w = Window.partitionBy("__id").orderBy("pos")
    marked
      .withColumn("gain",
        coalesce(least(lit(k), col("pos") - lag("pos", 1).over(w)), lit(k)))
      .groupBy("__id")
      .agg(max("n_tokens").as("n_tokens"),
        count(lit(1)).as("dup_grams"),
        sum(col("gain").cast("long")).as("covered_tokens"))
      .withColumn("dup_fraction",
        col("covered_tokens").cast("double") / col("n_tokens").cast("double"))
      .select(col("__id").as(idCol), col("n_tokens"), col("dup_grams"),
        col("covered_tokens"), col("dup_fraction"))
  }
}
