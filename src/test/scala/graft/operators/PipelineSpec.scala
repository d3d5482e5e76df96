package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** End-to-end properties of the dedup / similarity-search tier on the
  * sf0.001 testdata — including the recall assertions that the DuckDB
  * oracle cannot express (LSH ANN, fingerprint determinism).
  */
class PipelineSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val embs = Tables.embeddings(spark, sfDir)

  test("minhash LSH pairs equal exact n-gram Jaccard pairs (recall 1 here)") {
    val exact = TextDedupOps.ngramJaccardPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedupOps.minhashDedupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash pairs are a subset of exact pairs and catch most of them") {
    val exact = TextDedupOps.ngramJaccardPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = TextDedupOps.simhashDedupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.subsetOf(exact),
      s"simhash found non-near-dup pairs: ${sim.diff(exact)}")
    // 64-bit simhash saturates for a few heavily-edited planted pairs
    // (Hamming can exceed any threshold that excludes background pairs);
    // ≥80% recall is the honest floor on this corpus
    assert(sim.size >= exact.size * 0.8,
      s"simhash recall too low: ${sim.size}/${exact.size}")
  }

  test("blocked embedding dedup equals the naive all-pairs join exactly") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // low threshold → plenty of pairs from the random-noise bulk; several
    // blocks even at sf0.001
    val blocked = pairs(TextDedupOps
      .embeddingDedupPairs(embs, "vec_id", "embedding", 0.3, numBlocks = 8)
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("cos")))
    val naive = pairs(TextDedupOps
      .embeddingDedupPairsNaive(embs, "vec_id", "embedding", 0.3)
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("cos")))
    assert(naive.nonEmpty, "threshold should admit some pairs")
    assert(blocked == naive)
  }

  test("ngram df-cap bounds boilerplate pair explosion") {
    import spark.implicits._
    val boiler = (0 until 40).map(w => s"boiler$w").mkString(" ")
    val d = (0 until 60).map(i => (i.toLong, s"$boiler unique$i token$i end$i"))
      .toDF("doc_id", "text")
    // uncapped: every pair is a near-dup through the shared boilerplate
    val uncapped = TextDedupOps.ngramJaccardPairs(d, "doc_id", "text",
      maxDf = 1000000).count()
    assert(uncapped == 60L * 59 / 2)
    // capped: the boilerplate shingles (df=60) are dropped; the only
    // remaining shared shingles are per-doc-unique, so the posting
    // self-join emits a BOUNDED candidate set instead of all 1770 pairs
    val capped = TextDedupOps.ngramJaccardPairs(d, "doc_id", "text",
      maxDf = 5).count()
    assert(capped == 0, s"expected boilerplate-only pairs dropped, got $capped")
  }

  test("df-cap keeps jaccard values exact via hot-shingle completion") {
    import spark.implicits._
    val boiler = "terms of service apply to all documents here"
    val data = (0 until 5).flatMap { p =>
      val body = (0 until 20).map(w => s"body${p}w$w").mkString(" ")
      Seq((2L * p, s"$body $boiler"), (2L * p + 1, s"$body extra $boiler"))
    }
    val d = data.toDF("doc_id", "text")
    def pairs(maxDf: Int) =
      TextDedupOps.ngramJaccardPairs(d, "doc_id", "text", maxDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = pairs(1000000)
    // the boilerplate (df=10 > 5) is dropped from the posting join, but
    // each planted pair still shares its body shingles, survives, and
    // must report the SAME jaccard — the hot-shingle intersection is
    // restored before the threshold filter
    val capped = pairs(5)
    assert(uncapped.size == 5)
    assert(capped == uncapped)
  }

  test("simhash bucketCap bounds hot-bucket candidate explosion") {
    import spark.implicits._
    val base = (0 until 40).map(w => s"common$w").mkString(" ")
    // identical docs: ONE simhash value, so every band bucket holds all
    // 100 docs — the pathological hot-bucket shape (exactDedup territory)
    val same = (0 until 100).map(i => (i.toLong, base)).toDF("doc_id", "text")
    assert(TextDedupOps.simhashDedupPairs(same, "doc_id", "text").count() == 100L * 99 / 2)
    assert(TextDedupOps.simhashDedupPairs(same, "doc_id", "text", bucketCap = 20)
      .count() == 0, "buckets above the cap must be dropped")
    // near-identical docs: hot buckets dropped, small buckets survive —
    // the cap bounds per-bucket work (<= cap^2 pair rows) monotonically
    val varied = (0 until 100).map(i => (i.toLong, s"$base tail$i")).toDF("doc_id", "text")
    val uncapped = TextDedupOps.simhashDedupPairs(varied, "doc_id", "text").count()
    val capped = TextDedupOps.simhashDedupPairs(varied, "doc_id", "text",
      bucketCap = 20).count()
    assert(uncapped >= 4000, s"expected most of the 4950 near-dup pairs, got $uncapped")
    assert(capped < uncapped / 2,
      s"cap should prune hot-bucket candidates: $capped vs $uncapped")
  }

  test("null embedding vectors are excluded from blocked dedup (matches naive)") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, null.asInstanceOf[Array[Double]]), (4L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // threshold <= 0 is the divergence trap: a zero-padded null would
    // emit cos-0.0 pairs the naive form's null cosine never produces
    val blocked = pairs(TextDedupOps
      .embeddingDedupPairs(d, "vec_id", "embedding", 0.0, numBlocks = 2))
    val naive = pairs(TextDedupOps
      .embeddingDedupPairsNaive(d, "vec_id", "embedding", 0.0))
    assert(blocked == naive)
    assert(!blocked.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("embedding dedup rejects non-integral id columns") {
    import spark.implicits._
    val d = Seq(("a", Array(1.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      TextDedupOps.embeddingDedupPairs(d, "vec_id", "embedding", 0.5)
    }
  }

  test("chunkDocuments: window starts, overlap, containment rule, tail") {
    import spark.implicits._
    def txt(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val d = Seq(
      (1L, txt(10)),           // chunk 8 / overlap 4 → starts 0, 4 (8 is
                               // a 2-token tail ⊆ window@4 — dropped)
      (2L, txt(3)),            // shorter than one chunk → one window
      (3L, txt(13)),           // starts 0, 4, 8 (12 dropped: 1 ≤ overlap)
      (4L, null.asInstanceOf[String])) // null text → no chunks
      .toDF("doc_id", "text")
    val out = CorpusOps.chunkDocuments(d, "doc_id", "text", 8, 4)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.map(c => (c._1, c._2)).toSeq ==
      Seq((1L, 0L), (1L, 1L), (2L, 0L), (3L, 0L), (3L, 1L), (3L, 2L)))
    // consecutive windows share exactly the overlap tokens
    assert(out(0)._3 == (1 to 8).map("t" + _).mkString(" "))
    assert(out(1)._3 == (5 to 10).map("t" + _).mkString(" ") && out(1)._4 == 6L)
    // a doc shorter than one chunk is one whole-doc window
    assert(out(2)._3 == "t1 t2 t3" && out(2)._4 == 3L)
    // the tail window may be shorter but never ≤ the overlap
    assert(out.forall(c => c._4 > 4L || c._2 == 0L))
    // deterministic under partitioning (narrow op)
    val again = CorpusOps.chunkDocuments(d.repartition(7), "doc_id", "text", 8, 4)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
    intercept[IllegalArgumentException](
      CorpusOps.chunkDocuments(d, "doc_id", "text", 8, 8))
  }

  test("hash split is deterministic, stable under corpus growth, near trainFrac") {
    val full = CorpusOps.hashSplit(docs, "doc_id", 0.9)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // assignment is a pure function of the id: splitting a SUBSET gives
    // the same labels — growing the corpus never reassigns old docs
    val subset = CorpusOps.hashSplit(docs.filter(col("doc_id") < 50), "doc_id", 0.9)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(subset.nonEmpty && subset.size < full.size)
    assert(subset.forall { case (k, v) => full(k) == v })
    val frac = full.values.count(_ == "train").toDouble / full.size
    assert(math.abs(frac - 0.9) < 0.1, s"train fraction $frac too far from 0.9")
    intercept[IllegalArgumentException](CorpusOps.hashSplit(docs, "doc_id", 1.5))
  }

  test("stratified sample keeps per-stratum rates, stable under growth") {
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val kept = CorpusOps.stratifiedSample(docs, "doc_id", "lang", rates)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptByLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // unlisted strata kept wholesale; listed strata near their rate
    for ((lang, total) <- byLang) {
      val k = keptByLang.getOrElse(lang, 0)
      val want = rates.getOrElse(lang, 1.0)
      assert(math.abs(k.toDouble / total - want) < 0.25,
        s"$lang kept $k/$total, wanted ~$want")
    }
    // pure function of the id: a subset keeps exactly its survivors
    val sub = CorpusOps.stratifiedSample(docs.filter(col("doc_id") < 50),
        "doc_id", "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sub === kept.map(_._1).filter(_ < 50).toSet)
    intercept[IllegalArgumentException](
      CorpusOps.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.0)))
  }

  test("canonical-per-group keeps the heaviest row, ties to min id") {
    import spark.implicits._
    val df = Seq((1L, 10L, "g1"), (2L, 30L, "g1"), (3L, 30L, "g1"),
      (4L, 5L, "g2")).toDF("id", "w", "g")
    val got = CorpusOps.canonicalPerGroup(df, "g", "w", "id")
      .select("g", "id").as[(String, Long)].collect().toMap
    assert(got === Map("g1" -> 2L, "g2" -> 4L))
  }

  test("vocabulary counts document frequency, not term frequency") {
    import spark.implicits._
    val df = Seq((1L, "a a a b"), (2L, "b c"), (3L, "c c b")).toDF("id", "text")
    val got = TextAnalysisOps.vocabulary(df, "text", 10)
      .as[(String, Long)].collect().toSeq
    // b in 3 docs, a in 1, c in 2; order (df desc, token asc)
    assert(got === Seq(("b", 3L), ("c", 2L), ("a", 1L)))
  }

  test("pii redaction scrubs emails, phones and ips with counts") {
    import spark.implicits._
    val df = Seq((1L,
      "mail me at jo.an+x@sub.example.org or 10.20.30.40, tel +1-555-000-1234")
    ).toDF("id", "text")
    val r = TextAnalysisOps.piiRedact(df, "text")
      .select("n_emails", "n_phones", "n_ips", "redacted").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((1, 1, 1)))
    assert(r.getString(3) ===
      "mail me at <EMAIL> or <IP>, tel <PHONE>")
  }

  test("deterministic shuffle reproduces per seed and permutes across seeds") {
    def order(seed: String) = CorpusOps.deterministicShuffle(docs, "doc_id", seed)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order("42") == order("42"))
    assert(order("42") != order("43"))
    assert(order("42").sorted == order("43").sorted)
  }

  test("exact dedup keeps one representative per distinct text") {
    val total = docs.count()
    val dedup = TextDedupOps.exactDedup(docs, "doc_id", "text")
    assert(dedup.agg(sum("n_copies")).head.getLong(0) == total)
    assert(dedup.count() ==
      docs.select(countDistinct("text")).head.getLong(0))
  }

  test("SQ8 ANN: near-exact recall vs brute force (quantization " +
      "distortion, not bucketing, is the only approximation)") {
    val queries = embs.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorSearchOps.bruteForceTopK(
      embs, queries, "vec_id", "embedding", 10))
    val sq8 = pairs(VectorSearchOps.sq8TopK(
      embs, queries, "vec_id", "embedding", 10))
    val recall = brute.intersect(sq8).size.toDouble / brute.size
    // 8-bit per-dim codes barely move cosines: on this corpus the
    // candidate stage keeps every true neighbor — pin a high floor
    assert(recall >= 0.9, s"SQ8 recall $recall below floor")
    assert(pairs(VectorSearchOps.sq8TopK(
      embs, queries, "vec_id", "embedding", 10)) == sq8, "deterministic")
  }

  test("filtered ANN: pre-filter semantics are exact over the subset; " +
      "matchCols compile to a hash join, not a cross join") {
    val queries = embs.filter(col("vec_id") < 10)
    val got = VectorSearchOps.filteredTopK(embs, queries,
      "vec_id", "embedding", 5, Seq("label"))
    // exact-over-subset: per query, results equal brute force over the
    // label-restricted corpus
    val labels = queries.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val gotPairs = got.select("q_id", "nbr_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    labels.foreach { case (qid, lbl) =>
      val expect = VectorSearchOps.bruteForceTopK(
          embs.filter(col("label") === lbl),
          queries.filter(col("vec_id") === qid), "vec_id", "embedding", 5)
        .select("q_id", "nbr_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(gotPairs.filter(_._1 == qid) == expect,
        s"query $qid (label $lbl) diverges from brute force over subset")
    }
    // every result respects the constraint
    val corpusLabels = embs.select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    gotPairs.foreach { case (q, n, _) =>
      assert(corpusLabels(n) == labels(q), s"$n leaked across labels") }
    // plan: the label equality is a broadcast HASH join — the filtered
    // path must not fall back to the nested-loop cross join
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("ANN-LSH candidates give useful recall vs brute force") {
    val queries = embs.filter(col("vec_id") < 10)
    val brute = VectorSearchOps.bruteForceTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = VectorSearchOps.annLshTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size
    // embeddings here are near-random (no planted neighbor structure —
    // max pairwise cosine ~0.5), the hardest case for LSH; the useful
    // assertions are determinism + a floor well above chance.
    // Chance level: candidates cover < 25% of the corpus.
    assert(recall >= 0.25, s"ANN recall $recall below floor")
    val again = VectorSearchOps.annLshTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == ann, "ANN must be deterministic")
  }

  test("IVF ANN is deterministic with a useful recall floor") {
    val queries = embs.filter(col("vec_id") < 10)
    val brute = VectorSearchOps.bruteForceTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorSearchOps.ivfTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // nprobe/nlist = 4/32 → ~12.5% of a structureless corpus probed;
    // chance recall would be ~0.125
    assert(recall >= 0.15, s"IVF recall $recall below floor")
    val again = VectorSearchOps.ivfTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == ivf, "IVF must be deterministic")
  }

  test("PQ ANN: deterministic, ADC approximates cosine, useful recall") {
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 5)
    val brute = VectorSearchOps.bruteForceTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = VectorSearchOps.pqTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // sample-trained codebooks on a structureless corpus: well above
    // chance (10 of ~500), and exact-refined so survivors are true cosines
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.25, s"PQ recall $recall below floor")
    val again = VectorSearchOps.pqTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pq, "PQ must be deterministic")
    // the refine stage emits exact cosines: every (q, nbr) PQ returns
    // scores identically to the brute-force scorer
    val bruteCos = VectorSearchOps.bruteForceTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    VectorSearchOps.pqTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id", "cos").collect().foreach { r =>
        bruteCos.get((r.getLong(0), r.getLong(1))).foreach { exact =>
          assert(r.getDouble(2) == exact, s"refined cosine must be exact")
        }
      }
  }

  test("IVF-PQ ANN: deterministic, probed-list subset of PQ scan, " +
      "useful recall, exact refined cosines") {
    val embs = Tables.embeddings(spark, sfDir)
    val queries = embs.filter(col("vec_id") < 5)
    val brute = VectorSearchOps.bruteForceTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = VectorSearchOps.ivfPqTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // two approximations stack (coarse pruning × code quantization) on
    // a structureless corpus — chance would be ~0.125 (nprobe/nlist)
    val recall = brute.intersect(ivfpq).size.toDouble / brute.size
    assert(recall >= 0.15, s"IVF-PQ recall $recall below floor")
    val again = VectorSearchOps.ivfPqTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == ivfpq, "IVF-PQ must be deterministic")
    // the refine stage emits exact cosines wherever brute also ranked
    // the pair
    val bruteCos = VectorSearchOps.bruteForceTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id", "cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    VectorSearchOps.ivfPqTopK(embs, queries, "vec_id", "embedding", 10)
      .select("q_id", "nbr_id", "cos").collect().foreach { r =>
        bruteCos.get((r.getLong(0), r.getLong(1))).foreach { exact =>
          assert(r.getDouble(2) == exact, s"refined cosine must be exact")
        }
      }
  }

  test("language-id + quality + token stats are sane") {
    val st = TextAnalysisOps.qualityScore(docs, "text")
    val bad = st.filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
    val li = TextAnalysisOps.languageId(docs, "text")
    assert(li.filter(col("pred_lang").isNull).count() == 0)
    val ts = TextAnalysisOps.tokenStats(docs, "text")
    assert(ts.filter(col("n_distinct") > col("n_tokens")).count() == 0)
  }

  test("passage dedup: cross-doc k-gram coverage with interval merge") {
    import spark.implicits._
    // shared = an 8-token passage planted in docs 1 and 2 at different
    // offsets; doc 3 repeats ITS OWN passage twice (self-repetition:
    // must not count); doc 4 is clean filler
    val shared = "the quick brown fox jumps over the lazy"
    val selfRep = "one two three four five six seven eight"
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta"),
      (2L, s"$shared omega psi chi phi upsilon tau sigma rho"),
      (3L, s"$selfRep junk1 junk2 $selfRep"),
      (4L, "completely different words with no duplication at all here ok")
    ).toDF("doc_id", "text")
    val out = TextDedupOps.passageDupStats(corpus, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    // only docs 1 and 2 appear (doc 3's repetition is within one doc)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // exactly one shared 8-gram each, covering 8 tokens
    out.foreach { r =>
      assert(r.getLong(2) == 1L, "dup_grams")       // dup_grams
      assert(r.getLong(3) == 8L, "covered_tokens")  // covered_tokens
    }

    // overlap merge: docs 5/6 share a 10-token run = three overlapping
    // 8-grams; covered tokens must be 10 (union), not 24 (sum)
    val run = "a b c d e f g h i j"
    val corpus2 = Seq(
      (5L, s"x1 x2 $run x3 x4"),
      (6L, s"y1 $run y2 y3 y4 y5")
    ).toDF("doc_id", "text")
    val out2 = TextDedupOps.passageDupStats(corpus2, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    assert(out2.length == 2)
    out2.foreach { r =>
      assert(r.getLong(2) == 3L)   // 3 overlapping duplicated 8-grams
      assert(r.getLong(3) == 10L)  // merged coverage = run length
    }

    // dup_fraction is coverage / doc length
    val d5 = out2.find(_.getLong(0) == 5L).get
    assert(d5.getLong(1) == 14L && math.abs(d5.getDouble(4) - 10.0 / 14) < 1e-12)
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse") {
    import spark.implicits._
    val decomposed = "cafe\u0301"   // e + COMBINING ACUTE ACCENT
    val composed = "café"      // precomposed é
    val corpus = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "a\u0000 \u0007bcd\u007f"),          // NUL/BEL/DEL stripped
      (4L, "  too \t many\n\n spaces \r ")
    ).toDF("doc_id", "text")
    val out = TextAnalysisOps.normalizeText(corpus, "text")
      .orderBy("doc_id").collect().map(_.getAs[String]("norm_text"))
    assert(out(0) == out(1), "NFC must unify composed and decomposed forms")
    assert(out(0) == composed)
    assert(out(2) == "a bcd")
    assert(out(3) == "too many spaces")
  }

  test("DSIR selection prefers target-like docs; gumbel variant deterministic") {
    import spark.implicits._
    val aWords = "alpha beta gamma delta epsilon zeta eta theta"
    val bWords = "zork quux blarg wibble flob grok snarf plugh"
    val raw = ((1L to 10L).map(i => (i, aWords + s" extra$i")) ++
      (11L to 20L).map(i => (i, bWords + s" extra$i"))).toDF("doc_id", "text")
    val target = Seq((100L, aWords), (101L, aWords)).toDF("doc_id", "text")
    val picked = CorpusOps.dsirSelect(raw, target, "doc_id", "text", k = 10)
      .collect().map(_.getLong(0)).toSet
    // the ten A-vocabulary docs outrank every B-vocabulary doc
    assert(picked == (1L to 10L).toSet, s"got $picked")

    // gumbel resampling is deterministic and biased toward the target
    val g1 = CorpusOps.dsirSelect(raw, target, "doc_id", "text",
      k = 10, gumbel = true).collect().map(_.getLong(0)).toSet
    val g2 = CorpusOps.dsirSelect(raw, target, "doc_id", "text",
      k = 10, gumbel = true).collect().map(_.getLong(0)).toSet
    assert(g1 == g2, "gumbel top-k must be deterministic per salt")
    assert((g1 & (1L to 10L).toSet).size >= 6,
      "resampling must still prefer target-like docs")
  }

  test("tfidf vectors: unit norm, right dim, near-dups are nearest") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apples and oranges grow on trees in the warm orchard"),
      (2L, "apples and oranges grow on trees in the warm garden"),
      (3L, "stochastic gradient descent optimizes deep neural network weights")
    ).toDF("doc_id", "text")
    val v = TextAnalysisOps.tfidfVectors(corpus, "doc_id", "text", dim = 64)
    val rows = v.orderBy("doc_id").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val arr = r.getSeq[Float](1)
      assert(arr.length == 64)
      val norm = math.sqrt(arr.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4, s"norm $norm")
    }
    // doc 1's nearest neighbor is its near-duplicate doc 2, not doc 3
    val top = VectorSearchOps.bruteForceTopK(
      v, v.filter(col("doc_id") === 1), "doc_id", "tfidf", 2)
      .orderBy("rank").collect()
    assert(top.head.getLong(top.head.fieldIndex("nbr_id")) == 2L)
    // feeds the embedding-dedup kernel too: pair (1,2) crosses 0.8 cosine
    val pairs = TextDedupOps.embeddingDedupPairs(v, "doc_id", "tfidf",
      threshold = 0.8)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
  }
}
