package graft.functions.impl

import scala.collection.mutable

import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels: greedy lowest-rank merge application over
  * whitespace words. The merge table comes from
  * [[graft.operators.TextAnalysisOps.trainBpe]] (driver-trained on a
  * deterministic corpus sample) and rides into the expression as a
  * constructor constant — application is a zero-shuffle narrow map.
  */
object BpeImpl {

  /** Tokenize one word (a char-symbol sequence) by applying merges in
    * rank order until none applies — the classic BPE inference loop.
    * Returns the number of resulting symbols.
    */
  def wordTokens(word: String, rank: java.util.HashMap[String, Integer]): Int = {
    if (word.isEmpty) return 0
    var syms = word.map(_.toString).toBuffer
    var go = syms.length > 1
    while (go) {
      // lowest-rank applicable pair
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + " " + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) go = false
      else {
        // merge EVERY occurrence of that pair, left to right
        val a = syms(bestIdx)
        val b = syms(bestIdx + 1)
        val out = mutable.Buffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out
        go = syms.length > 1
      }
    }
    syms.length
  }

  /** Total BPE token count of a whitespace-tokenized text. */
  def tokenCount(text: UTF8String, rank: java.util.HashMap[String, Integer]): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    val n = s.length
    while (start < n) {
      while (start < n && s.charAt(start) == ' ') start += 1
      var end = start
      while (end < n && s.charAt(end) != ' ') end += 1
      if (end > start) total += wordTokens(s.substring(start, end), rank)
      start = end
    }
    total
  }

  /** Build the rank lookup once per expression instance (merges are
    * "a b" space-separated pair strings in rank order — symbols come
    * from space-split words, so they never contain a space and the
    * key is unambiguous). */
  def buildRank(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), i); i += 1 }
    m
  }
}
