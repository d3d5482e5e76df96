package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design (100 TB stance): the query set is small and the corpus
  * is huge, so every variant broadcasts the *queries* and streams the
  * corpus — never the reverse, and never a corpus self-shuffle. Top-k
  * per query is a window over (query, candidate) pairs, which AQE
  * handles as a standard partial-sort; for very large k-lists swap in
  * a bounded-heap Aggregator.
  */
object VectorSearchOps {

  /** Brute-force cosine top-k: every (query x corpus) pair scored with
    * the codegen'd cosine kernel, ranked per query. Exact; the recall
    * baseline for [[annLshTopK]].
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
  }

  /** FILTERED vector search — metadata-constrained exact top-k, the
    * tenant/category-scoped query every production vector store serves
    * (`top-k among vectors WHERE <metadata predicate>`). This is
    * PRE-filtering: the constraint applies before any distance is
    * computed, so recall over the satisfying subset is exact — the
    * post-filtering alternative (top-k first, filter after) silently
    * returns fewer than k under selective predicates.
    *
    * Two constraint shapes compose:
    *  - static predicates: the caller filters/joins `corpus` before the
    *    call (a `lang = 'en'` filter or a metadata-table semi-join);
    *    Catalyst pushes scan-level predicates into parquet, so at
    *    100 TB the distance kernel only ever sees surviving rows;
    *  - per-query attributes via `matchCols`: each query searches only
    *    corpus rows sharing its values (tenant isolation, label-scoped
    *    search). Equality on `matchCols` turns the brute-force CROSS
    *    join into a broadcast HASH join — the constraint is the join
    *    key, so each corpus row meets only its own partition's queries
    *    instead of all of them.
    */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, matchCols: Seq[String] = Seq.empty): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id") +:
      col(vecCol).cast("array<double>").as("cv") +: matchCols.map(col): _*)
    val q = queries.select(col(idCol).as("q_id") +:
      col(vecCol).cast("array<double>").as("qv") +: matchCols.map(col): _*)
    val joined =
      if (matchCols.isEmpty) c.crossJoin(broadcast(q))
      else c.join(broadcast(q), matchCols)
    joined.filter(col("nbr_id") =!= col("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Candidate set via multi-table random-hyperplane LSH: a corpus row
    * is a candidate for a query if they share a bucket in any of
    * `tables` independent hash tables. Returns (q_id, nbr_id) distinct.
    * Corpus side computes `tables` bucket ids in one narrow pass
    * (posexplode), then equi-joins the broadcast query buckets — the
    * 100TB-shaped plan: no corpus shuffle, scan-side filter.
    */
  def lshCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, numBits: Int, tables: Int, seed: Long = 42L): DataFrame = {
    def buckets(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as("v"))
        .select(col(id), col("v"), posexplode(array(
          (0 until tables).map(t =>
            GraftFunctions.lshBucket(col("v"), numBits, seed + 1000L * t)): _*)))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val cb = buckets(corpus, "nbr_id")
    val qb = buckets(queries, "q_id")
    cb.join(broadcast(qb.select("q_id", "table", "bucket")), Seq("table", "bucket"))
      .filter(col("nbr_id") =!= col("q_id"))
      .select("q_id", "nbr_id").distinct()
  }

  /** IVF (inverted-file) ANN top-k — the coarse-quantizer scale path.
    *
    * Centroids are a deterministic sample of the corpus (the `nlist`
    * rows with lexicographically smallest `md5(id)` hex digest — the
    * repo's PORTABLE-hash convention, so a SQL oracle replays the exact
    * sample) collected to the driver: a model artifact of nlist×dim
    * doubles, legitimately driver-sized, inlined into the plan as a
    * literal array. That makes list assignment a ZERO-SHUFFLE narrow map
    * (an `aggregate` argmax over the literal centroids per row) — at
    * 100 TB the corpus is scanned once, never re-partitioned; queries
    * probe their `nprobe` closest lists and only candidate
    * (query × list-member) pairs are scored exactly.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 32, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val cents = c.withColumn("h", md5(col("nbr_id").cast("string")))
      .orderBy("h").limit(nlist)
      .select("nbr_id", "cv").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val centArr = array(cents.toIndexedSeq.map { case (cid, v) =>
      struct(lit(cid).as("cid"), lit(v).as("v")) }: _*)
    def bestList(vec: Column): Column =
      aggregate(centArr,
        struct(lit(-1L).as("cid"), lit(-2.0).as("sim")),
        (acc, ce) => {
          val s = GraftFunctions.cosine(vec, ce.getField("v"))
          when(s > acc.getField("sim"),
            struct(ce.getField("cid").as("cid"), s.as("sim"))).otherwise(acc)
        }).getField("cid")
    val assigned = c.withColumn("cid", bestList(col("cv")))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val probes = q.select(col("q_id"), col("qv"), explode(centArr).as("ce"))
      .select(col("q_id"), col("qv"), col("ce.cid").as("cid"),
        GraftFunctions.cosine(col("qv"), col("ce.v")).as("csim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("csim").desc, col("cid").asc)))
      .filter(col("rk") <= nprobe)
      .select("q_id", "qv", "cid")
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("nbr_id") =!= col("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
  }

  /** ANN top-k: LSH candidates re-ranked by exact cosine. Approximate —
    * recall depends on numBits/tables vs the data's similarity
    * structure. A true neighbor at angle θ survives one table with
    * probability (1-θ/π)^numBits; defaults (6 bits x 8 tables) probe
    * ~12% of a structureless corpus for ~0.4 recall at cosine ~0.45 —
    * on real embedding corpora (near-dup neighbors at cosine 0.9+,
    * θ≈25°: per-table 0.86^6≈0.40, 8 tables ≈ 0.98 recall) the same
    * defaults are near-exact while probing far less.
    */
  /** Product-quantization ANN top-k (IVF-less ADC scan + exact refine).
    *
    * The corpus compresses to `m` byte-sized codes per vector against a
    * per-subspace codebook of `ksub` centroids — at 100 TB the ADC scan
    * touches `m` longs per row instead of `dim` doubles (32× less with
    * the defaults on dim-64 vectors), and the full vectors are read
    * again only for the `k·refine` candidates that survive per query.
    *
    * Codebook training mirrors [[ivfTopK]]'s determinism contract: the
    * `ksub` corpus rows with lexicographically smallest md5(id) hex
    * digest (the portable-hash convention), L2-normalized on the
    * driver, contribute their j-th subvector to subspace j — a
    * model artifact of ksub×dim doubles inlined into the plan, so both
    * the encode pass and the ADC scan are ZERO-SHUFFLE narrow maps
    * (kernels: [[graft.functions.GraftFunctions.pqEncode]]/pqLut/pqAdc).
    * Candidates re-rank by exact cosine via a semi-join back to the
    * corpus — never carrying full vectors through the scan.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
      refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val codebook = buildCodebook(
      c.withColumn("h", md5(col("nbr_id").cast("string")))
        .orderBy("h")
        .limit(ksub).select("cv").collect().map(_.getSeq[Double](0).toArray),
      m, ksub)
    val encoded = c.select(col("nbr_id"),
      GraftFunctions.pqEncode(col("cv"), codebook, m, ksub).as("codes"))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("lut", GraftFunctions.pqLut(col("qv"), codebook, m, ksub))
    // ADC scan over codes only; keep k·refine candidates per query
    val cand = encoded.crossJoin(broadcast(q.select("q_id", "lut")))
      .filter(col("nbr_id") =!= col("q_id"))
      .select(col("q_id"), col("nbr_id"),
        GraftFunctions.pqAdc(col("codes"), col("lut"), ksub).as("adc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("nbr_id").asc)))
      .filter(col("rk") <= k.toLong * refine)
      .select("q_id", "nbr_id")
    // exact refine on the survivors only
    cand.join(c, Seq("nbr_id")).join(broadcast(q.select("q_id", "qv")), Seq("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Scalar-quantization (SQ8) ANN top-k — the compression point
    * between the exact scan and PQ: each dimension quantizes to one
    * byte against per-dimension [min, max] bounds, an 8× shrink on
    * dim-64 double vectors with far less distortion than PQ's 8-byte
    * codes. The bounds come from ONE aggregation pass over the corpus
    * (2·dim doubles — a driver-sized model artifact like the IVF
    * centroids, inlined into the plan as literals), so encode, decode
    * and the approximate scan are ZERO-SHUFFLE narrow maps; at 100 TB
    * the stored/scanned form is the byte codes, the decoded doubles
    * exist only inside the scoring projection, and the full vectors
    * are re-read only for the k·refine survivors per query (exact
    * refine via semi-join back to the corpus, same as [[pqTopK]]).
    * Everything is deterministic double arithmetic — a SQL oracle
    * replays the bounds, the round-trip quantization and both ranking
    * stages exactly.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val headRow = c.select(size(col("cv"))).head(1)
    require(headRow.nonEmpty,
      "sq8TopK needs a non-empty corpus — the per-dimension min/max " +
        "bounds are trained from the corpus itself")
    val dim = headRow.head.getInt(0)
    val statExprs = (0 until dim).flatMap(i => Seq(
      min(element_at(col("cv"), i + 1)), max(element_at(col("cv"), i + 1))))
    val statRow = c.agg(statExprs.head, statExprs.tail: _*).head
    require((0 until 2 * dim).forall(!statRow.isNullAt(_)),
      "sq8TopK needs non-NULL vector components in every dimension — " +
        "an all-NULL dimension has no min/max bounds to quantize against")
    val mins = Array.tabulate(dim)(i => statRow.getDouble(2 * i))
    val maxs = Array.tabulate(dim)(i => statRow.getDouble(2 * i + 1))
    val lo = lit(mins)
    val hi = lit(maxs)
    // quantize + dequantize in one narrow pass: code = round(255·t),
    // decoded = lo + code/255·(hi−lo); a constant dimension (hi = lo)
    // codes to 0 and decodes to the constant
    val dv = transform(col("cv"), (x, i) => {
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      when(h === l, l).otherwise(
        l + round((x - l) / (h - l) * lit(255)) / lit(255.0) * (h - l))
    })
    val decoded = c.select(col("nbr_id"), dv.as("dv"))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val cand = decoded.crossJoin(broadcast(q))
      .filter(col("nbr_id") =!= col("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("dv")), 6).as("approx"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("approx").desc, col("nbr_id").asc)))
      .filter(col("rk") <= k.toLong * refine)
      .select("q_id", "nbr_id")
    cand.join(c, Seq("nbr_id")).join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Flat [m][ksub][sub] codebook over L2-normalized sample rows: the
    * sample's j-th subvector seeds subspace j's centroids. If the
    * corpus has fewer than ksub rows, the sample cycles (duplicate
    * centroids are harmless — argmin picks the first).
    */
  private def buildCodebook(sample: Array[Array[Double]], m: Int,
      ksub: Int): Array[Double] = {
    require(sample.nonEmpty, "corpus is empty")
    val dim = sample.head.length
    require(dim % m == 0, s"vector dim $dim must be divisible by m=$m")
    val sub = dim / m
    val codebook = new Array[Double](m * ksub * sub)
    for (cIdx <- 0 until ksub) {
      val v = sample(cIdx % sample.length)
      val norm = math.sqrt(v.map(x => x * x).sum)
      val inv = if (norm > 0) 1.0 / norm else 0.0
      for (j <- 0 until m; t <- 0 until sub)
        codebook((j * ksub + cIdx) * sub + t) = v(j * sub + t) * inv
    }
    codebook
  }

  /** IVF-PQ composite ANN top-k — the full 100 TB shape: the coarse
    * quantizer prunes the corpus to the queries' `nprobe` lists BEFORE
    * the compressed scan touches anything, and only `k·refine`
    * survivors per query are re-read exactly. [[ivfTopK]] prunes lists
    * but scans full vectors inside them; [[pqTopK]] compresses rows but
    * ADC-scans every one; this composes both, so the per-query scan
    * cost drops to (nprobe/nlist of the corpus) × (m bytes per row)
    * plus the bounded exact refine — the FAISS IVFPQ layout.
    *
    * Same determinism contract as the parents: coarse centroids are
    * the `nlist` md5-smallest corpus rows, the PQ codebook the `ksub`
    * md5-smallest (the portable-hash convention), both inlined as plan
    * literals — so list assignment AND encode ride ONE zero-shuffle
    * narrow pass over the corpus, and the SQL oracle replays the exact
    * samples. Codes are plain PQ codes over the normalized vector
    * (FAISS `by_residual=false`): residual codes would couple the
    * codebook to the coarse assignment, breaking the replayable-oracle
    * decomposition, and at these list counts recall is driven by
    * `nprobe`, not residual precision.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 32, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("nbr_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val cents = c.withColumn("h", md5(col("nbr_id").cast("string")))
      .orderBy("h").limit(nlist)
      .select("nbr_id", "cv").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val centArr = array(cents.toIndexedSeq.map { case (cid, v) =>
      struct(lit(cid).as("cid"), lit(v).as("v")) }: _*)
    def bestList(vec: Column): Column =
      aggregate(centArr,
        struct(lit(-1L).as("cid"), lit(-2.0).as("sim")),
        (acc, ce) => {
          val s = GraftFunctions.cosine(vec, ce.getField("v"))
          when(s > acc.getField("sim"),
            struct(ce.getField("cid").as("cid"), s.as("sim"))).otherwise(acc)
        }).getField("cid")
    val codebook = buildCodebook(
      c.withColumn("h", md5(col("nbr_id").cast("string")))
        .orderBy("h")
        .limit(ksub).select("cv").collect().map(_.getSeq[Double](0).toArray),
      m, ksub)
    // ONE narrow pass: coarse list id + PQ codes per corpus row — the
    // full vector is dropped here and re-read only at the refine.
    // `cid` rides through a single-element explode: joining directly on
    // an alias of the aggregate() fold trips Catalyst's
    // InferFiltersFromConstraints into synthesizing a filter that
    // references the corpus vector column on the PROBE side of the join
    // (an unresolvable plan — [INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND]);
    // the Generate node breaks the alias-constraint chain so no such
    // filter is inferred, at the cost of a no-op generator per row.
    val assigned = c.select(col("nbr_id"),
        explode(array(bestList(col("cv")))).as("cid"),
        GraftFunctions.pqEncode(col("cv"), codebook, m, ksub).as("codes"))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).cast("array<double>").as("qv"))
    // the probe table — each query's nprobe list ids, each row carrying
    // its query's ADC LUT — is MATERIALIZED as a driver-side model
    // artifact, like the centroids: bounded at nq × nprobe rows of
    // m·ksub doubles (the ANN contract is a broadcast-sized query set).
    // Materializing also severs the probe plan's lineage from the
    // corpus scan, so the big side's optimizer constraints (the list
    // assignment is an alias over a corpus column) cannot leak across
    // the join into the probe branch.
    val probePlan = q.select(col("q_id"), col("qv"), explode(centArr).as("ce"))
      .select(col("q_id"), col("qv"), col("ce.cid").as("cid"),
        GraftFunctions.cosine(col("qv"), col("ce.v")).as("csim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("csim").desc, col("cid").asc)))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("cid"),
        GraftFunctions.pqLut(col("qv"), codebook, m, ksub).as("lut"))
    val probes = corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(probePlan.collect(): _*), probePlan.schema)
    // ADC only inside the probed lists
    val cand = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("nbr_id") =!= col("q_id"))
      .select(col("q_id"), col("nbr_id"),
        GraftFunctions.pqAdc(col("codes"), col("lut"), ksub).as("adc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc").desc, col("nbr_id").asc)))
      .filter(col("rk") <= k.toLong * refine)
      .select("q_id", "nbr_id")
    cand.join(c, Seq("nbr_id")).join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
  }

  def annLshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numBits: Int = 6, tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val cand = lshCandidates(corpus, queries, idCol, vecCol, numBits, tables, seed)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("qv"))
    cand.join(c, Seq("nbr_id")).join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("nbr_id"),
        round(GraftFunctions.cosine(col("qv"), col("cv")), 6).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
  }
}
