package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Hand-computed examples + invariants for the corpus-curation tier
  * added in round 7: repetition signals, BM25 search, contamination
  * overlap, and token-budget packing. The DuckDB oracle covers the
  * full-corpus outputs; these pin the per-row arithmetic on inputs
  * small enough to verify by hand.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("repetitionStats computes hand-checked fractions") {
    val df = Seq((1L, "x x y"), (2L, "x y x y x")).toDF("id", "text")
    val r = TextAnalysisOps.repetitionStats(df, "text")
      .select("id", "n_tokens", "dup_token_frac", "dup_bigram_frac",
        "top_bigram_frac")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4))).sortBy(_._1)
    // "x x y": 3 toks (2 distinct) -> dup 1/3; bigrams {"x x","x y"}
    // all distinct -> dup 0, top 1/2
    assert(r(0) == ((1L, 3, 1.0 / 3, 0.0, 0.5)))
    // "x y x y x": 5 toks (2 distinct) -> dup 3/5; bigrams
    // ["x y","y x","x y","y x"] -> dup 2/4, top 2/4
    assert(r(1) == ((2L, 5, 3.0 / 5, 0.5, 0.5)))
  }

  test("bm25Search ranks by term evidence; absent terms score zero") {
    val df = Seq(
      (1L, "spark spark spark pad pad"),
      (2L, "spark pad pad pad pad"),
      (3L, "pad pad pad pad pad")).toDF("id", "text")
    val r = TextAnalysisOps.bm25Search(df, "id", "text", Seq("spark"), topK = 3)
      .select("id", "score", "rank")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getInt(2)))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L),
      "more term occurrences must rank higher")
    assert(r.map(_._3).toSeq == Seq(1, 2, 3))
    assert(r(2)._2 == 0.0, "doc without the term scores exactly 0")
    assert(r(0)._2 > r(1)._2 && r(1)._2 > 0.0)
  }

  test("bm25Search tf saturation: doubling tf less than doubles the score") {
    val df = Seq(
      (1L, "q pad pad pad pad pad pad pad"),
      (2L, "q q pad pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad pad pad")).toDF("id", "text")
    val byId = TextAnalysisOps.bm25Search(df, "id", "text", Seq("q"), topK = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(2L) > byId(1L) && byId(2L) < 2.0 * byId(1L))
  }

  test("crossCorpusOverlap computes exact benchmark-side fractions") {
    val corpus = Seq((10L, "a b c d"), (11L, "p q r s")).toDF("id", "text")
    val bench = Seq((20L, "b c d e")).toDF("id", "text")
    // bench shingles {"b c d","c d e"}; doc 10 shares {"b c d"} -> 1/2;
    // doc 11 shares none
    val r = TextDedupOps.crossCorpusOverlap(corpus, bench, "id", "id", "text",
        minFrac = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((10L, 20L, 1L, 0.5)))
  }

  test("crossCorpusOverlap flags a benchmark doc present in the corpus at 1.0") {
    val bench = docs.filter(col("doc_id") % 37 === 0)
    val hits = TextDedupOps.crossCorpusOverlap(docs, bench, "doc_id", "doc_id", "text")
      .collect()
    val self = hits.filter(r => r.getLong(0) == r.getLong(1))
    assert(self.length == bench.count(),
      "every leaked benchmark doc must self-match")
    assert(self.forall(_.getDouble(3) == 1.0))
  }

  test("temperatureMix flattens strata toward n^(1/T), keeps the smallest whole") {
    val natural = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = natural.values.min
    val mixed = CorpusOps.temperatureMix(docs, "doc_id", "lang", 2.0)
    val kept = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // smallest stratum rate is exactly 1.0 -> kept wholesale
    val smallest = natural.minBy(_._2)._1
    assert(kept(smallest) == nMin)
    natural.foreach { case (lang, n) =>
      val expected = n * math.sqrt(nMin.toDouble / n) // = sqrt(nMin * n)
      assert(math.abs(kept(lang) - expected) <= 3 * math.sqrt(expected),
        s"$lang kept ${kept(lang)} vs expected ~$expected")
    }
    // exposed keep_rate matches the contract r = sqrt(n_min/n)
    mixed.select("lang", "n_stratum", "keep_rate").distinct().collect()
      .foreach { r =>
        assert(r.getDouble(2) == math.sqrt(nMin.toDouble / r.getLong(1)))
      }
    // deterministic: membership is a function of the id, not partitioning
    val ids1 = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = CorpusOps.temperatureMix(docs.repartition(7), "doc_id", "lang", 2.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("packBins matches a sequential re-pack of each group") {
    val budget = 512
    val withTokens = docs.withColumn("n_tokens", size(split(col("text"), " ")))
    val packed = CorpusOps.packBins(withTokens, "doc_id", "n_tokens", budget)
      .select("doc_id", "grp", "pack_key", "bin", "cum_before", "n_tokens")
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(packed.map(_._1).toSet.size > 1, "multiple hash groups expected")
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, id, bin, cumBefore, nTok) =>
        assert(cumBefore == cum, s"doc $id cum_before")
        assert(bin == cum / budget, s"doc $id bin")
        cum += nTok
      }
    }
    // deterministic: a re-run (different partitioning) gives identical bins
    val again = CorpusOps.packBins(withTokens.repartition(7), "doc_id",
        "n_tokens", budget)
      .select("doc_id", "bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed.forall { case (_, _, id, bin, _, _) => again(id) == bin })
  }

  test("thresholdSweep: hand-checked PR curve, clamped outliers") {
    val session = spark
    import session.implicits._
    // scores 0.05/0.15/0.25/0.35 land in bins 0..3; the 9.0 outlier
    // clamps to the top bin; labels T,F,T,T,F
    val df = Seq((0.05, true), (0.15, false), (0.25, true), (0.35, true),
      (9.0, false)).toDF("score", "pos")
    val got = CorpusOps.thresholdSweep(df, "score", "pos", 4, 0.0, 0.4)
      .orderBy("bin")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // kept counts from the top: bin3 holds 0.35 + clamped 9.0
    assert(got.map(x => (x._1, x._3, x._4)).toSeq ==
      Seq((0L, 5L, 3L), (1L, 4L, 2L), (2L, 3L, 2L), (3L, 2L, 1L)))
    got.foreach { case (_, thr, kept, tp, totalPos, prec, rec) =>
      assert(totalPos == 3L)
      assert(prec == tp.toDouble / kept)
      assert(rec == tp.toDouble / 3.0)
      assert(thr >= 0.0 && thr <= 0.4)
    }
    // partitioning-invariant (integer counts)
    val again = CorpusOps.thresholdSweep(df.repartition(5), "score", "pos",
        4, 0.0, 0.4)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == got.map(x => (x._1, x._3, x._4)).toSeq)
    intercept[IllegalArgumentException] {
      CorpusOps.thresholdSweep(df, "score", "pos", 0, 0.0, 0.4)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.thresholdSweep(df, "score", "pos", 4, 0.4, 0.0)
    }
  }

  test("classifierScore: hand-checked logit, sigmoid, keep flag") {
    // single-bucket model: weight 1.0 on the bucket of token "x", 0
    // elsewhere — a doc's logit is bias + (fraction of x tokens)
    val xBucket = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest("x".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString, 16)
    val w = Array.tabulate(256)(i => if (i == xBucket) 1.0 else 0.0)
    val df = Seq((1L, "x x y z"), (2L, "y z"), (3L, "x x x x")).toDF("doc_id", "text")
    val got = TextAnalysisOps.classifierScore(df, "doc_id", "text", w, -0.25)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("logit"),
          r.getAs[Double]("score"), r.getAs[Boolean]("keep")))).toMap
    assert(got(1L)._1 == 4L && got(1L)._2 == 0.25) // bias + 2/4 x-tokens
    assert(got(2L)._2 == -0.25 && !got(2L)._4)
    assert(got(3L)._2 == 0.75 && got(3L)._4)
    got.values.foreach { case (_, logit, score, keep) =>
      assert(math.abs(score - 1.0 / (1.0 + math.exp(-logit))) < 1e-15)
      assert(keep == (logit >= 0.0))
    }
  }

  test("classifierScore: partitioning-invariant (integer-sum exactness)") {
    val w = Array.tabulate(256)(i => (i - 128) / 130.0)
    def logits(df: org.apache.spark.sql.DataFrame, wt: Array[Double]) =
      TextAnalysisOps.classifierScore(df, "doc_id", "text", wt, 0.1)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("logit"))).toSet
    val a = logits(docs, w)
    assert(a == logits(docs.repartition(13), w) && a.nonEmpty)
    // weights are quantized: a sub-micro perturbation cannot change scores
    assert(logits(docs, w.map(_ + 1e-9)) == a)
  }

  test("classifierScore rejects a wrong-sized weight vector") {
    intercept[IllegalArgumentException] {
      TextAnalysisOps.classifierScore(docs, "doc_id", "text", Array(1.0), 0.0)
    }
  }

  test("BPE: classic merge training and token counting") {
    import spark.implicits._
    // word freqs: hug x3, pug x2, pun x1, bun x1 → pair counts
    // (u,g)=5 > (h,u)=3 = (p,u)=3 > (u,n)=2 > (b,u)=1
    val corpus = Seq((1L, "hug pug pun bun hug hug pug")).toDF("doc_id", "text")
    val merges = TextAnalysisOps.trainBpe(corpus, "text", numMerges = 3)
    // merge 1: ug; merge 2: h+ug; merge 3: tie (p,ug)=2 vs (u,n)=2 →
    // lexicographic tie-break picks (p, ug)
    assert(merges.toSeq == Seq("u g", "h ug", "p ug"))

    // counting under the trained table: hug→1, pug→1, pun→3 tokens
    val st = TextAnalysisOps.bpeTokenStats(
      Seq((1L, "hug pug pun")).toDF("doc_id", "text"), "text", merges)
      .select("n_words", "n_bpe_tokens").head()
    assert(st.getLong(0) == 3 && st.getLong(1) == 5)

    // training is deterministic (hash-sampled, lexicographic ties)
    val again = TextAnalysisOps.trainBpe(corpus, "text", numMerges = 3)
    assert(again.toSeq == merges.toSeq)

    // exhaustion: more merges requested than pairs exist is fine
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m2 = TextAnalysisOps.trainBpe(tiny, "text", numMerges = 50)
    assert(m2.toSeq == Seq("a b"))
    val st2 = TextAnalysisOps.bpeTokenStats(tiny, "text", m2)
      .select("n_bpe_tokens").head()
    assert(st2.getLong(0) == 2)
  }

  test("bigramLmScore: hand-checked add-one-smoothed bigram logprobs") {
    import spark.implicits._
    // one doc "a b a b": bigrams (a,b)x2 (b,a)x1; c1: a=2 b=1; V=2
    val one = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = TextAnalysisOps.bigramLmScore(one, "doc_id", "text").collect()
    assert(r.length == 1 && r.head.getLong(1) == 3) // n_bigrams
    val lpAb = math.round(math.log(3.0 / 4.0) * 1e6) // (2+1)/(2+2)
    val lpBa = math.round(math.log(2.0 / 3.0) * 1e6) // (1+1)/(1+2)
    assert(r.head.getLong(2) == 2 * lpAb + lpBa)

    // an out-of-distribution doc scores below in-distribution ones
    val corpus = ((1 to 10).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran")) :+
      (99L, "zxqv wyrk plmn qqtz bbnv")).toDF("doc_id", "text")
    val scored = TextAnalysisOps.bigramLmScore(corpus, "doc_id", "text")
      .orderBy(col("avg_logprob").asc).collect()
    assert(scored.head.getLong(0) == 99L,
      "the gibberish doc must have the lowest avg_logprob")
    // docs shorter than 2 tokens are excluded
    val tiny = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    assert(TextAnalysisOps.bigramLmScore(tiny, "doc_id", "text").count() == 1)
  }
}
