package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

/** Column-level API over graft's native Catalyst expressions — the
  * `org.apache.spark.sql.functions`-style facade. All of these stay
  * inside whole-stage codegen.
  */
object GraftFunctions {

  /** MinHash signature (array<bigint>, length `numHashes`) of a token
    * array column. */
  def minhash(tokens: Column, numHashes: Int, seed: Long = 42L): Column =
    toCol(MinHashSig(toExpr(tokens), numHashes, seed))

  /** 64-bit SimHash of a token array column. */
  def simhash(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))

  /** Min rolling-hash fingerprint over character k-grams of a string. */
  def fingerprint(text: Column, k: Int = 16): Column =
    toCol(DocFingerprint(toExpr(text), k))

  /** Mergeable KMV bottom-k distinct sketch AGGREGATE over a long
    * (hash) column: evaluates to the k smallest distinct values,
    * ascending. Partial state is k-capped, so the shuffle carries
    * sketches, not distinct values. */
  def kmvSketch(hashes: Column, k: Int): Column =
    toCol(KmvSketchAgg(toExpr(hashes), k).toAggregateExpression())

  /** Union AGGREGATE over a column of KMV sketches (array<bigint>):
    * bottom-k of the union — losslessly equal to the single-pass sketch
    * of the underlying values (the merge law that makes per-day/
    * per-partition sketches the 100 TB answer: union in kilobytes, no
    * re-scan). Composes with [[kmvSketch]] across aggregation levels. */
  def kmvMerge(sketches: Column, k: Int): Column =
    toCol(KmvMergeAgg(toExpr(sketches), k).toAggregateExpression())

  /** Bottom-k-by-hash uniform row-sample AGGREGATE: the (hash, value)
    * pairs with the k smallest distinct hashes, sorted by hash — a
    * deterministic mergeable k-sample for quantile estimation with
    * k-bounded partial state. See [[KmvSampleAgg]]. */
  def kmvSample(hashes: Column, values: Column, k: Int): Column =
    toCol(KmvSampleAgg(toExpr(hashes), toExpr(values), k).toAggregateExpression())

  /** Frequent-items (Misra-Gries) heavy-hitters AGGREGATE over a string
    * column: ≤ `cap` counters per group, array<struct<item, n>> sorted
    * count-desc/item-asc. Each count undercounts by at most n/(cap+1);
    * below capacity it is exact. See [[FreqSketchAgg]]. */
  def freqSketch(items: Column, cap: Int): Column =
    toCol(FreqSketchAgg(toExpr(items), cap).toAggregateExpression())

  /** Union [[freqSketch]] summaries (the mergeable-summaries law) —
    * per-day/per-partition heavy-hitter rollups in kilobytes. */
  def freqMerge(sketches: Column, cap: Int): Column =
    toCol(FreqMergeAgg(toExpr(sketches), cap).toAggregateExpression())

  /** Union [[kmvSample]] sketches (array<struct<h, v>> rows) back into
    * one bottom-k sample — the quantile-rollup counterpart of
    * [[kmvMerge]]. See [[KmvSampleMergeAgg]]. */
  def kmvSampleMerge(sketches: Column, k: Int): Column =
    toCol(KmvSampleMergeAgg(toExpr(sketches), k).toAggregateExpression())

  /** Distinct fnv64 hashes of word-`k`-gram shingles of a string column,
    * computed in one byte-level pass. Feed the result to [[minhash]] /
    * [[simhash]] for bit-identical, string-free signatures. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    toCol(WordShingleHashes(toExpr(text), k))

  /** Block-nested-loop exact cosine pair kernel over two packed vector
    * blocks; see [[CosinePairsAbove]]. */
  def cosinePairs(itemsA: Column, itemsB: Column, sameBlock: Column,
      threshold: Double): Column =
    toCol(CosinePairsAbove(toExpr(itemsA), toExpr(itemsB), toExpr(sameBlock), threshold))

  private def asDoubles(c: Column): Column = c.cast("array<double>")

  /** Dot product of two array<double> (or array<float>) columns. */
  def dot(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(asDoubles(a)), toExpr(asDoubles(b))))

  /** Cosine similarity of two array<double> (or array<float>) columns. */
  def cosine(a: Column, b: Column): Column =
    toCol(CosineSim(toExpr(asDoubles(a)), toExpr(asDoubles(b))))

  /** Sparse (bucket, weight) entry arrays → dense L2-normalized
    * float[dim] (buckets as bigint, weights as double; order-aligned
    * arrays, e.g. two collect_lists from one aggregate). */
  def denseNormalize(buckets: Column, weights: Column, dim: Int): Column =
    toCol(DenseNormalize(toExpr(buckets), toExpr(weights), dim))

  /** Unicode NFC normalization of a string column. */
  def nfc(s: Column): Column = toCol(NfcNormalize(toExpr(s)))

  /** BPE token count under a trained merge table (rank-ordered
    * space-separated pairs from TextAnalysisOps.trainBpe). */
  def bpeTokenCount(text: Column, merges: Array[String]): Column =
    toCol(BpeTokenCount(toExpr(text), merges))

  /** Product-quantization kernels (codebook: flat [m][ksub][dim/m]). */
  def pqEncode(v: Column, codebook: Array[Double], m: Int, ksub: Int): Column =
    toCol(PqEncode(toExpr(asDoubles(v)), codebook, m, ksub))
  def pqLut(q: Column, codebook: Array[Double], m: Int, ksub: Int): Column =
    toCol(PqLut(toExpr(asDoubles(q)), codebook, m, ksub))
  def pqAdc(codes: Column, lut: Column, ksub: Int): Column =
    toCol(PqAdc(toExpr(codes), toExpr(lut), ksub))

  /** Random-hyperplane LSH bucket of a dense-vector column. */
  def lshBucket(vec: Column, numBits: Int, seed: Long = 42L): Column =
    toCol(HyperplaneBucket(toExpr(asDoubles(vec)), numBits, seed))

  /** Hamming distance between two 64-bit hash columns (e.g. SimHash):
    * popcount of xor — composed from built-ins, codegen'd. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
