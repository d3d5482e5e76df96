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
