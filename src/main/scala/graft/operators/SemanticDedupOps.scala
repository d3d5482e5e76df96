package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.GraftFunctions

/** SemDeDup-style semantic deduplication: spherical k-means coarse
  * clustering over an embedding column, then EXACT cosine pairs within
  * each cluster (Abbas et al. 2023, "SemDeDup: Data-efficient learning
  * at web-scale through semantic deduplication" — the standard
  * cluster-then-pairwise recipe for pruning near-duplicate training
  * data).
  *
  * This is the scale path [[TextDedupOps.embeddingDedupPairs]]'s docs
  * point at: that operator is exact-all-pairs (quadratic by contract);
  * this one bounds pair enumeration to within-cluster candidates, which
  * on a corpus with genuine semantic structure covers near-dup pairs at
  * a tiny fraction of the n² volume. Recall is governed by `probes`
  * (each row joins its `probes` closest clusters — a pair is compared
  * if the two rows SHARE any cluster), pinned on a planted-cluster
  * corpus in SemanticDedupSpec.
  *
  * 100 TB design:
  *  - centroids train on a deterministic hash-sample (`sampleMax` rows
  *    via partial top-k, never a full sort) with a few distributed
  *    Lloyd iterations — per iteration the only wide op is a
  *    (k × dim)-cell partial aggregate; the k×dim centroid matrix is a
  *    driver-sized model artifact, inlined into the plan as a literal
  *    (same pattern as [[VectorSearchOps.ivfTopK]]);
  *  - full-corpus assignment is a ZERO-SHUFFLE narrow map against the
  *    literal centroids;
  *  - within-cluster pairing reuses the blocked GEMM-shaped kernel
  *    ([[graft.functions.Expressions CosinePairsAbove]]): one shuffle
  *    keyed (cluster, block), fixed-width block pairs, no per-pair row
  *    materialization. Cluster size imbalance is absorbed by the block
  *    grid — a huge cluster becomes many block pairs, not one task.
  *
  * Candidate volume is Σ|cluster|² ≈ probes²·n²/k: at FIXED k this is a
  * k-fold cut of all-pairs, not linear growth. The scale recipe is
  * k ∝ n (bounded expected cluster size — SemDeDup's own regime: 50k
  * clusters over web-scale corpora), under which candidate volume grows
  * linearly; training cost stays bounded because the sample is capped.
  */
object SemanticDedupOps {

  /** Train spherical k-means centroids on a deterministic hash-sample.
    * Returns a k × dim matrix (rows L2-normalized). Deterministic for a
    * fixed corpus: sample = `sampleMax` smallest xxhash64(id), init =
    * first k of those, ties in assignment break toward the lower
    * centroid index.
    */
  def trainCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 4, sampleMax: Int = 4096): Array[Array[Double]] = {
    require(k > 0 && iters >= 0)
    val nrm = sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x))
    // sample: partial top-k by hash (TakeOrdered — no global sort), zero
    // vectors excluded (no direction); normalize so the mean is the
    // spherical centroid
    val sample = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(nrm > 0.0)
      .withColumn("vn", transform(col("v"), x => x / nrm))
      .withColumn("h", xxhash64(col("id")))
      .orderBy("h").limit(sampleMax)
      .select("h", "vn")
      .cache()
    try {
      val init = sample.orderBy("h").limit(k)
        .collect().map(_.getSeq[Double](1).toArray)
      require(init.nonEmpty, "empty corpus (or all-zero vectors)")
      var cents: Array[Array[Double]] = init
      val dim = cents(0).length
      for (_ <- 0 until iters) {
        val assigned = sample.withColumn("cid", nearestCid(col("vn"), cents))
        // (k × dim)-cell aggregate: sum per (cluster, coordinate) —
        // partial map-side combine keeps the shuffle at k*dim rows
        val sums = assigned
          .select(col("cid"), posexplode(col("vn")).as(Seq("pos", "x")))
          .groupBy("cid", "pos").agg(sum("x").as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        val counts = Array.fill(cents.length)(0L)
        sums.foreach { r =>
          val cid = r.getInt(0); val pos = r.getInt(1)
          next(cid)(pos) = r.getDouble(2) / r.getLong(3)
          counts(cid) = r.getLong(3)
        }
        cents = next.zipWithIndex.map { case (c, i) =>
          if (counts(i) == 0L) cents(i) // empty cluster keeps its centroid
          else {
            val n = math.sqrt(c.map(x => x * x).sum)
            if (n == 0.0) cents(i) else c.map(_ / n)
          }
        }
        require(cents.forall(_.length == dim))
      }
      cents
    } finally { sample.unpersist(); () }
  }

  private def centArr(cents: Array[Array[Double]]): Column =
    array(cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), lit(c).as("cv"))
    }: _*)

  /** Argmax-cosine cluster id over literal centroids — a single narrow
    * fold, ties to the lower cid. */
  private def nearestCid(vec: Column, cents: Array[Array[Double]]): Column =
    aggregate(centArr(cents),
      struct(lit(-1).as("cid"), lit(-2.0).as("sim")),
      (acc, ce) => {
        val s = GraftFunctions.cosine(vec, ce.getField("cv"))
        when(s > acc.getField("sim"),
          struct(ce.getField("cid").as("cid"), s.as("sim"))).otherwise(acc)
      }).getField("cid")

  /** Top-`probes` cluster ids by cosine (ties to the lower cid):
    * sort the scored centroid list, slice, project cids. Narrow. */
  private def topCids(vec: Column, cents: Array[Array[Double]], probes: Int): Column =
    slice(
      sort_array(transform(centArr(cents), ce =>
        struct((-GraftFunctions.cosine(vec, ce.getField("cv"))).as("ns"),
          ce.getField("cid").as("cid")))),
      1, probes)

  /** Near-duplicate pairs (id_a < id_b, cos rounded to 6) whose cosine
    * meets `threshold`, restricted to pairs sharing at least one of
    * their `probes` nearest clusters. Output schema matches
    * [[TextDedupOps.embeddingDedupPairs]]; on a corpus where near-dups
    * are semantically clustered the two agree (recall pinned in
    * SemanticDedupSpec), at within-cluster instead of all-pairs cost.
    */
  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Int = 16, probes: Int = 2, iters: Int = 4,
      sampleMax: Int = 4096, numBlocks: Int = 0): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"semanticDedupPairs needs an integral id column; $idCol is $idType")
    require(probes >= 1 && probes <= k, s"probes must be in 1..$k")
    val cents = trainCentroids(df, idCol, vecCol, k, iters, sampleMax)
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // assignment: narrow map, one row per (id, probed cluster)
    val assigned = v
      .select(col("id"), col("v"), explode(topCids(col("v"), cents, probes)).as("ce"))
      .select(col("id"), col("v"), col("ce.cid").as("cid"))
    // block grid within clusters — same parallelism/memory knob as
    // embeddingDedupPairs, derived from plan-time stats when unset;
    // sized over the whole corpus, so a skewed cluster just owns more
    // block pairs
    val nSub =
      if (numBlocks > 0) numBlocks
      else {
        val bytes = v.queryExecution.optimizedPlan.stats.sizeInBytes
        math.min(1024L, math.max(8L, (bytes / (32L << 20)).toLong)).toInt
      }
    val blocks = assigned
      .groupBy(col("cid"), pmod(xxhash64(col("id")), lit(nSub)).as("blk"))
      .agg(collect_list(struct(col("id"), col("v"))).as("items"))
    // pairs once per (cluster, unordered block pair); the kernel emits
    // (lo, hi) canonical ids so a pair sharing several probed clusters
    // collapses in the final distinct
    blocks.as("a").join(blocks.as("b"),
        col("a.cid") === col("b.cid") && col("a.blk") <= col("b.blk"))
      .select(explode(GraftFunctions.cosinePairs(
        col("a.items"), col("b.items"),
        col("a.blk") === col("b.blk"), threshold - 1e-6)).as("p"))
      .select(col("p.id_a").cast(idType).as("id_a"),
        col("p.id_b").cast(idType).as("id_b"),
        round(col("p.cos"), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }
}
