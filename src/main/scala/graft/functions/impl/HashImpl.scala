package graft.functions.impl

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM implementations behind graft's Catalyst expressions. Static,
  * allocation-light methods so generated code can call them from inside
  * whole-stage codegen.
  *
  * Hash construction is standard public material: FNV-1a base hash +
  * the splitmix64 finalizer (Steele et al., "Fast Splittable
  * Pseudorandom Number Generators") for per-permutation mixing.
  */
object HashImpl {

  /** splitmix64 finalizer — full-avalanche 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a over UTF-8 bytes. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** MinHash signature of a token array: sig(i) = min over tokens of
    * mix64(baseHash(token) ^ seed_i). One pass over tokens, O(n·k);
    * null tokens are skipped.
    */
  def minhash(tokens: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv64(tokens.getUTF8String(t))
        var i = 0
        while (i < numHashes) {
          val g = mix64(h ^ mix64(seed + i))
          if (g < sig(i)) sig(i) = g
          i += 1
        }
      }
      t += 1
    }
    ArrayData.toArrayData(sig)
  }

  /** 64-bit SimHash over tokens (Charikar, "Similarity estimation
    * techniques from rounding algorithms"): per-bit vote of each token's
    * base hash, sign → bit.
    */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = mix64(fnv64(tokens.getUTF8String(t)))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Distinct FNV-1a hashes of the word-`k`-gram shingles of `text`, in
    * one pass over the UTF-8 bytes. Tokens are the (possibly empty)
    * spans between single 0x20 separators — exactly `split(text, " ")`
    * semantics — and a window of `k` consecutive tokens joined by `' '`
    * is byte-identical to the original span from the first token's start
    * to the last token's end, so each shingle hashes a byte *range* of
    * the input: no token strings, no shingle strings, no array churn.
    * Texts shorter than `k` tokens produce their single whole-text
    * shingle, never zero. Matches `fnv64` of the equivalent shingle
    * string, so MinHash/SimHash built on these hashes are bit-identical
    * to their string-shingle forms.
    */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    // starts(t) = byte offset of token t; sentinel makes "end of token
    // t" uniformly starts(t+1) - 1 (one past the final byte)
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = bytes.length + 1
    val m = math.max(nTok - k, 0) + 1
    // open-addressing dedup set, power-of-two capacity >= 2m. Capacity
    // math runs in Long: `m * 2` as Int wraps negative for ~2^30-token
    // documents and the probe loop below would then never terminate on a
    // 4-slot table. Documents that large cannot fit the set anyway
    // (an Array[Long] tops out near 2^31), so reject them explicitly.
    require(m < (1 << 30),
      s"document has $m shingles; shingleHashes supports < 2^30")
    var cap = 4
    while (cap < m.toLong * 2) cap <<= 1
    val slots = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](m)
    var nOut = 0
    var w = 0
    while (w < m) {
      val e = starts(math.min(w + k, nTok)) - 1 // end-exclusive
      var h = 0xCBF29CE484222325L
      var j = starts(w)
      while (j < e) { h ^= (bytes(j) & 0xFFL); h *= 0x100000001B3L; j += 1 }
      var idx = (mix64(h) & (cap - 1)).toInt
      var dup = false
      while (used(idx) && !dup) {
        if (slots(idx) == h) dup = true else idx = (idx + 1) & (cap - 1)
      }
      if (!dup) { used(idx) = true; slots(idx) = h; out(nOut) = h; nOut += 1 }
      w += 1
    }
    ArrayData.toArrayData(
      if (nOut == m) out else java.util.Arrays.copyOf(out, nOut))
  }

  /** [[minhash]] over pre-hashed tokens (array<long> of `fnv64` values):
    * sig(i) = min over hashes of mix64(h ^ mix64(seed_i)) — bit-identical
    * to the string form when the longs are the tokens' fnv64 hashes.
    */
  def minhashFromHashes(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = hashes.getLong(t)
        var i = 0
        while (i < numHashes) {
          val g = mix64(h ^ mix64(seed + i))
          if (g < sig(i)) sig(i) = g
          i += 1
        }
      }
      t += 1
    }
    ArrayData.toArrayData(sig)
  }

  /** [[simhash]] over pre-hashed tokens — bit-identical to the string
    * form when the longs are the tokens' fnv64 hashes.
    */
  def simhashFromHashes(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val h = mix64(hashes.getLong(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Document fingerprint: min over all UTF-16 char k-grams of a mixed
    * polynomial rolling hash — the winnowing-family min-hash fingerprint
    * (Schleimer/Wilkerson/Aiken, "Winnowing: local algorithms for
    * document fingerprinting"). Texts shorter than k hash the whole
    * string.
    */
  def rollingFingerprint(text: UTF8String, k: Int): Long = {
    val s = text.toString
    val n = s.length
    if (n == 0) return 0L
    val P = 1000003L
    if (n <= k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * P + s.charAt(i); i += 1 }
      return mix64(h)
    }
    // pow = P^(k-1) for removing the leading char
    var pow = 1L
    var i = 1
    while (i < k) { pow *= P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * P + s.charAt(i); i += 1 }
    var min = mix64(h)
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * P + s.charAt(i)
      val m = mix64(h)
      if (m < min) min = m
      i += 1
    }
    min
  }
}
