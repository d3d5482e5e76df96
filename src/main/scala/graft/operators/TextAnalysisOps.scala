package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
