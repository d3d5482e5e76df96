package graft.functions.impl

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector kernels over Catalyst ArrayData (array<double> columns).
  * Index-order sequential accumulation — deterministic, and bit-for-bit
  * reproducible against any engine that folds the list left-to-right
  * (the DuckDB oracle does).
  */
object VectorImpl {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def normSq(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = a.getDouble(i); acc += v * v; i += 1 }
    acc
  }

  def norm(a: ArrayData): Double = math.sqrt(normSq(a))

  /** cosine = dot / (sqrt(|a|^2) * sqrt(|b|^2)); 0 for zero vectors. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm(a)
    val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Random-hyperplane LSH bucket (Charikar): sign bit per hyperplane,
    * hyperplanes drawn deterministically from `seed` via splitmix64 →
    * uniform(-1,1) components. numBits <= 63.
    */
  def hyperplaneBucket(a: ArrayData, numBits: Int, seed: Long): Long = {
    val dim = a.numElements()
    var bucket = 0L
    var b = 0
    while (b < numBits) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        // component (b, i) of the hyperplane matrix, derived not stored
        val r = HashImpl.mix64(seed + b.toLong * 1000003L + i)
        // map to (-1, 1): top 53 bits → [0,1) → shift
        val u = (r >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0
        acc += u * a.getDouble(i)
        i += 1
      }
      if (acc > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}
