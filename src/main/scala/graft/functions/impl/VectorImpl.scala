package graft.functions.impl

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

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

  /** Unpack an array<struct<id:long, v:array<double>>> block into
    * primitive arrays (ids, vectors, norms) once per kernel call, so the
    * O(|A|·|B|·dim) pair loop below touches only flat double[]s.
    * Null vectors are SKIPPED (not zero-padded): the naive self-join
    * form excludes null-vector rows — its cosine expression yields null,
    * which fails any threshold filter — and the blocked kernel must
    * agree even at threshold <= 0, where a zero-length stand-in would
    * have emitted cos 0.0 pairs the naive form never produces.
    */
  private def unpackBlock(items: ArrayData)
      : (Array[Long], Array[Array[Double]], Array[Double]) = {
    val n = items.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    var nOut = 0
    while (i < n) {
      val row = items.getStruct(i, 2)
      if (!row.isNullAt(1)) {
        val v = row.getArray(1).toDoubleArray()
        ids(nOut) = row.getLong(0)
        vecs(nOut) = v
        var acc = 0.0
        var t = 0
        while (t < v.length) { acc += v(t) * v(t); t += 1 }
        norms(nOut) = math.sqrt(acc)
        nOut += 1
      }
      i += 1
    }
    if (nOut == n) (ids, vecs, norms)
    else (java.util.Arrays.copyOf(ids, nOut), java.util.Arrays.copyOf(vecs, nOut),
      java.util.Arrays.copyOf(norms, nOut))
  }

  /** All pairs across two vector blocks with cosine >= threshold, as
    * array<struct<id_a, id_b, cos>> with id_a < id_b. `sameBlock` pairs
    * each element once (i < j); distinct blocks take the full cross
    * product (the caller enumerates unordered block pairs). This is the
    * block-nested-loop kernel behind exact all-pairs similarity: per
    * call it does a GEMM-shaped |A|·|B|·dim loop over flat doubles —
    * no per-pair row materialization, no array copies in the join.
    * Accumulation order matches [[cosine]], so emitted values are
    * bit-identical to the naive pairwise form.
    */
  def cosinePairs(a: ArrayData, b: ArrayData, sameBlock: Boolean,
      threshold: Double): ArrayData = {
    val (idsA, vecsA, normsA) = unpackBlock(a)
    val (idsB, vecsB, normsB) =
      if (sameBlock) (idsA, vecsA, normsA) else unpackBlock(b)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < idsA.length) {
      val vi = vecsA(i)
      val ni = normsA(i)
      var j = if (sameBlock) i + 1 else 0
      while (j < idsB.length) {
        val nj = normsB(j)
        var cos = 0.0
        if (ni != 0.0 && nj != 0.0) {
          val vj = vecsB(j)
          val dim = math.min(vi.length, vj.length)
          var d = 0.0
          var t = 0
          while (t < dim) { d += vi(t) * vj(t); t += 1 }
          cos = d / (ni * nj)
        }
        if (cos >= threshold && idsA(i) != idsB(j)) {
          val lo = math.min(idsA(i), idsB(j))
          val hi = math.max(idsA(i), idsB(j))
          out += new GenericInternalRow(Array[Any](lo, hi, cos))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
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

  /** Product-quantization kernels. The codebook is flat row-major
    * `[m][ksub][sub]` (sub = dim / m) over L2-NORMALIZED training
    * vectors; encode/lut normalize their input internally so the ADC
    * sum approximates the true cosine directly.
    */
  def pqEncode(v: ArrayData, codebook: Array[Double], m: Int, ksub: Int): ArrayData = {
    val dim = v.numElements()
    val sub = dim / m
    var s = 0.0
    var i = 0
    while (i < dim) { val x = v.getDouble(i); s += x * x; i += 1 }
    val inv = if (s > 0) 1.0 / math.sqrt(s) else 0.0
    val codes = new Array[Long](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * sub
        var d = 0.0
        var t = 0
        while (t < sub) {
          val diff = v.getDouble(j * sub + t) * inv - codebook(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best.toLong
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** Per-query lookup table: dot(q-normalized subvector j, centroid c)
    * for all (j, c) — flat [m][ksub]. */
  def pqLut(q: ArrayData, codebook: Array[Double], m: Int, ksub: Int): ArrayData = {
    val dim = q.numElements()
    val sub = dim / m
    var s = 0.0
    var i = 0
    while (i < dim) { val x = q.getDouble(i); s += x * x; i += 1 }
    val inv = if (s > 0) 1.0 / math.sqrt(s) else 0.0
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * sub
        var acc = 0.0
        var t = 0
        while (t < sub) {
          acc += q.getDouble(j * sub + t) * inv * codebook(base + t)
          t += 1
        }
        lut(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  /** Asymmetric distance: Σ_j lut[j·ksub + codes(j)] ≈ cosine(q, x). */
  def pqAdc(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += lut.getDouble(j * ksub + codes.getLong(j).toInt)
      j += 1
    }
    acc
  }

  /** Scatter sparse (bucket, weight) entries into a dense L2-normalized
    * float[dim] — one imperative pass, no per-element lambda dispatch
    * (the higher-order-function formulation interpreted ~dim map lookups
    * per row and was the whole cost of TF-IDF vector assembly).
    * Out-of-range buckets are ignored; a zero vector stays zero.
    */
  def denseNormalize(buckets: ArrayData, weights: ArrayData, dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    val n = math.min(buckets.numElements(), weights.numElements())
    var i = 0
    while (i < n) {
      val b = buckets.getLong(i)
      if (b >= 0 && b < dim) acc(b.toInt) += weights.getDouble(i)
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < dim) { s += acc(i) * acc(i); i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Float](dim)
    if (norm > 0) {
      i = 0
      while (i < dim) { out(i) = (acc(i) / norm).toFloat; i += 1 }
    }
    new GenericArrayData(out)
  }
}
