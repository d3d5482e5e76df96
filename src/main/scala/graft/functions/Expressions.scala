package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.impl.{BpeImpl, HashImpl, VectorImpl}

/** Native Catalyst expressions for the LLM-data-pipeline tier — text
  * hashing (MinHash / SimHash / winnowing fingerprint) and dense-vector
  * similarity. Each participates in whole-stage codegen via
  * `defineCodeGen` calling the static kernels in [[graft.functions.impl]],
  * so the hot path stays inside generated Java (no Scala-UDF
  * serialization, no boxing per row).
  *
  * The reference engine has no function surface at all (SURVEY.md §2.5:
  * comparisons + AND/OR only, query/parser/whereparser.go:146-169), so
  * this tier is pure extension, per the build brief.
  */
object GraftExpressions {
  /** Fully-qualified class carrying the static kernels, for codegen. */
  private[functions] val H = "graft.functions.impl.HashImpl"
  private[functions] val V = "graft.functions.impl.VectorImpl"
}

/** MinHash signature (array<long> of length `numHashes`) of a token
  * array: FNV-1a base hash per token, splitmix64 per-permutation mix.
  * Also accepts array<long> of pre-hashed tokens (fnv64 values, e.g.
  * from [[WordShingleHashes]]) — bit-identical output, skips the
  * per-token string hashing.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        (elemType == StringType || elemType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> or array<long>, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(tokens: Any): Any =
    if (elemType == StringType)
      HashImpl.minhash(tokens.asInstanceOf[ArrayData], numHashes, seed)
    else
      HashImpl.minhashFromHashes(tokens.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (elemType == StringType) "minhash" else "minhashFromHashes"
    defineCodeGen(ctx, ev,
      c => s"${GraftExpressions.H}.$m($c, $numHashes, ${seed}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (Charikar sign-of-votes). Also
  * accepts array<long> of pre-hashed tokens — bit-identical output.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        (elemType == StringType || elemType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> or array<long>, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(tokens: Any): Any =
    if (elemType == StringType) HashImpl.simhash(tokens.asInstanceOf[ArrayData])
    else HashImpl.simhashFromHashes(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (elemType == StringType) "simhash" else "simhashFromHashes"
    defineCodeGen(ctx, ev, c => s"${GraftExpressions.H}.$m($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Distinct fnv64 hashes of the word-`k`-gram shingles of a string, in
  * one pass over its UTF-8 bytes (see HashImpl.shingleHashes). The
  * hot-path replacement for split → slice/concat → distinct → hash
  * chains of built-ins, which materialize every token and shingle
  * string per row.
  */
case class WordShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "k must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(text: Any): Any =
    HashImpl.shingleHashes(text.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"${GraftExpressions.H}.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** Block-nested-loop cosine pair kernel: given two packed vector blocks
  * (array<struct<id:long, v:array<double>>>), emits every cross-block
  * pair with cosine >= `threshold` as array<struct<id_a, id_b, cos>>,
  * id_a < id_b. When `sameBlock` is true both inputs are the same block
  * and only i < j pairs are scored. The GEMM-shaped inner loop runs over
  * flat double[]s inside one eval call — the scale path for *exact*
  * all-pairs similarity, where per-pair join rows (two copied vectors
  * each) are the dominant cost. eval-only (CodegenFallback): the kernel
  * call is per block-pair, not per logical pair, so codegen of the
  * outer row loop is immaterial.
  */
case class CosinePairsAbove(itemsA: Expression, itemsB: Expression,
    sameBlock: Expression, threshold: Double)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = itemsA
  override def second: Expression = itemsB
  override def third: Expression = sameBlock
  private def okBlock(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == LongType &&
        (f1.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        })
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okBlock(itemsA.dataType) && okBlock(itemsB.dataType) &&
        sameBlock.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<long, array<double>>>, same, boolean), got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_cosine_pairs"
  override protected def nullSafeEval(a: Any, b: Any, same: Any): Any =
    VectorImpl.cosinePairs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      same.asInstanceOf[Boolean], threshold)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CosinePairsAbove =
    copy(itemsA = f, itemsB = s, sameBlock = t)
}

/** Winnowing-family min-fingerprint over character k-grams of a string. */
case class DocFingerprint(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, "k must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"
  override protected def nullSafeEval(text: Any): Any =
    HashImpl.rollingFingerprint(text.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${GraftExpressions.H}.rollingFingerprint($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}

/** Aggregation state for [[KmvSketchAgg]]: the k smallest DISTINCT
  * longs as a sorted-ascending primitive array — no per-row boxing or
  * node allocation on the update path (a TreeSet[java.lang.Long] boxes
  * every insert; at k <= 64 a memmove over <=512 bytes is cheaper than
  * tree rebalancing and allocation-free).
  */
final class KmvBuffer(k: Int) {
  private val arr = new Array[Long](k)
  private var n = 0

  def size: Int = n
  def get(i: Int): Long = arr(i)
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, n)

  /** Insert one candidate, keeping the array sorted-distinct and capped
    * at k (a full buffer drops its max to admit a smaller value). */
  def insert(h: Long): Unit = {
    if (n == k && h >= arr(n - 1)) return
    val idx = java.util.Arrays.binarySearch(arr, 0, n, h)
    if (idx >= 0) return // duplicate
    val at = -idx - 1
    val last = if (n < k) n else n - 1 // full: max falls off
    System.arraycopy(arr, at, arr, at + 1, last - at)
    arr(at) = h
    if (n < k) n += 1
  }

  /** Append a value known to be > every current element (deserialize
    * fast path over the sorted-distinct wire form). */
  def appendSorted(h: Long): Unit = { arr(n) = h; n += 1 }

  /** Merge another buffer in: its values iterate ascending, so once this
    * buffer is full and the next candidate is >= the max, no later
    * candidate can enter either. */
  def mergeFrom(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.n && !(n == k && other.arr(i) >= arr(n - 1))) {
      insert(other.arr(i))
      i += 1
    }
  }
}

/** Shared TypedImperativeAggregate plumbing over [[KmvBuffer]] state:
  * the merge law, the array<long> result, and the sorted-distinct-
  * ascending wire format are identical for the sketch and union
  * aggregates — one copy here so the format cannot diverge between
  * them.
  */
sealed trait KmvBufferAgg extends TypedImperativeAggregate[KmvBuffer] {
  def k: Int

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.get(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    // serialized form is sorted-distinct ascending: append directly
    while (bb.remaining() >= 8) buf.appendSorted(bb.getLong)
    buf
  }
}

/** Mergeable KMV (bottom-k) distinct-hash sketch aggregate: keeps the
  * `k` smallest DISTINCT values of a long column and evaluates to them
  * as a sorted-ascending array<long> — the classic distributed
  * distinct-count sketch. The aggregation state is a k-capped ordered
  * set, so the PARTIAL aggregate bounds what each task emits to k longs
  * per group: the shuffle carries kilobyte sketches, never the distinct
  * values themselves (the property that makes KMV the 100 TB answer;
  * a groupBy-distinct formulation shuffles every distinct value).
  * Mergeable by construction — the bottom-k of a union is the bottom-k
  * of the bottom-ks — so per-partition, per-day, or per-group sketches
  * union losslessly. Nulls are skipped. Deterministic for any input
  * partitioning and merge order.
  */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvBufferAgg
    with UnaryLike[Expression] {
  require(k >= 2, "k must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${child.dataType.simpleString}")
  override def prettyName: String = "graft_kmv_sketch"

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** Union of KMV sketches: aggregates a COLUMN OF SKETCHES (array<long>,
  * sorted-distinct ascending — [[KmvSketchAgg]]'s output) into the
  * bottom-k of their union, which by the KMV merge law equals the
  * single-pass sketch of the union of the underlying values. This is
  * the 100 TB pattern: per-day/per-partition sketches union in
  * kilobytes with NO re-scan of raw values. Nulls (and null elements)
  * are skipped; state and wire format are identical to KmvSketchAgg, so
  * the two compose freely across aggregation levels.
  */
case class KmvMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvBufferAgg
    with UnaryLike[Expression] {
  require(k >= 2, "k must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> (a KMV sketch), got ${other.simpleString}")
  }
  override def prettyName: String = "graft_kmv_merge"

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      // no sortedness assumed of the input array (a KmvSketchAgg output
      // ascends, but any array<long> is accepted) — insert is O(log k)
      // + a <=512-byte memmove at k <= 64, cheap enough per element
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) buf.insert(arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** Aggregation state for [[KmvSampleAgg]]: the pairs with the k
  * smallest DISTINCT hashes, parallel primitive arrays sorted by hash
  * ascending — same allocation-free shape as [[KmvBuffer]], carrying a
  * double payload per hash.
  */
/** Misra-Gries frequent-items summary: at most `cap` counters over a
  * string key space. The deterministic heavy-hitters sketch:
  *  - addOne: tracked key +1; untracked with room → new counter at 1;
  *    untracked and full → EVERY counter −1, zeros dropped (the classic
  *    MG step — the arrival's +1 and its own −1 cancel, so it is not
  *    inserted). Each decrement event retires cap+1 previously-added
  *    units, so there are ≤ n/(cap+1) events and update stays O(1)
  *    amortized.
  *  - estimate error: each stored count undercounts its key's true
  *    frequency by at most n/(cap+1); any key with true count above
  *    that bound is GUARANTEED present (the heavy-hitters contract).
  *  - merge (Agarwal et al., "Mergeable Summaries"): sum counters
  *    pairwise; if more than `cap` remain, subtract the (cap+1)-th
  *    largest count from all and keep the positive ones — the error
  *    bounds add, so two-level rollups keep the same n/(cap+1)
  *    guarantee over the union.
  * Below capacity no decrement ever fires, counts are exact, and merge
  * is exact summation — the regime the DuckDB oracle exercises; the
  * approximation regime is property-pinned instead (merge-order
  * dependence makes byte-exact cross-engine replay impossible there,
  * same acceptance as the GK sketch).
  */
final class FreqBuffer(val cap: Int) {
  val m: scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  def addOne(item: String): Unit = m.get(item) match {
    case Some(v)              => m.update(item, v + 1L)
    case None if m.size < cap => m.update(item, 1L)
    case None =>
      m.mapValuesInPlace((_, v) => v - 1L)
      m.filterInPlace((_, v) => v > 0L)
  }

  def mergeFrom(o: FreqBuffer): Unit = {
    o.m.foreach { case (k, v) => m.update(k, m.getOrElse(k, 0L) + v) }
    if (m.size > cap) {
      val vs = m.values.toArray
      java.util.Arrays.sort(vs)
      val d = vs(vs.length - cap - 1) // (cap+1)-th largest
      m.mapValuesInPlace((_, v) => v - d)
      m.filterInPlace((_, v) => v > 0L)
    }
  }

  /** Entries sorted by (count desc, item asc) — a deterministic order
    * for any given counter multiset. */
  def sortedEntries: Array[(String, Long)] =
    m.toArray.sortBy { case (item, n) => (-n, item) }
}

/** Shared plumbing for the frequent-items aggregates: state, merge law,
  * the array<struct<item, n>> result (count-desc, item-asc), and the
  * length-prefixed wire format.
  */
sealed trait FreqBufferAgg extends TypedImperativeAggregate[FreqBuffer] {
  def cap: Int

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(cap)

  override def merge(b1: FreqBuffer, b2: FreqBuffer): FreqBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: FreqBuffer): Any = {
    val es = buf.sortedEntries
    val rows = new Array[Any](es.length)
    var i = 0
    while (i < es.length) {
      rows(i) = InternalRow(UTF8String.fromString(es(i)._1), es(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: FreqBuffer): Array[Byte] = {
    val entries = buf.m.toArray
    val bytes = entries.map { case (k, _) => k.getBytes("UTF-8") }
    val bb = java.nio.ByteBuffer.allocate(
      4 + entries.length * 12 + bytes.map(_.length).sum)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len); bb.get(arr)
      buf.m.update(new String(arr, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }
}

/** Frequent-items (heavy hitters) sketch aggregate over a string
  * column: a Misra-Gries summary of at most `cap` counters, evaluated
  * as array<struct<item, n>> sorted count-desc/item-asc. The partial
  * aggregate bounds each task's per-group emission to `cap` entries, so
  * the shuffle carries kilobyte summaries however large the group —
  * the property that makes a top-k over 100 TB one pass + one kilobyte
  * shuffle instead of a full groupBy count of every distinct value.
  * Nulls are skipped.
  */
case class FreqSketchAgg(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends FreqBufferAgg
    with UnaryLike[Expression] {
  require(cap >= 1, "capacity must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def prettyName: String = "graft_freq_sketch"

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buf.addOne(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** Union of frequent-items summaries (array<struct<item, n>> rows —
  * [[FreqSketchAgg]] output) under the mergeable-summaries law: the
  * two-level rollup keeps the n/(cap+1) undercount guarantee over the
  * union, and below capacity it is exact summation (hash-matching the
  * single-pass sketch — the oracle regime). */
case class FreqMergeAgg(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends FreqBufferAgg
    with UnaryLike[Expression] {
  require(cap >= 1, "capacity must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == StringType &&
          s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<item string, n bigint>>, " +
        s"got ${other.simpleString}")
  }
  override def prettyName: String = "graft_freq_merge"

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val other = new FreqBuffer(cap)
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        other.m.update(row.getUTF8String(0).toString, row.getLong(1))
        i += 1
      }
      buf.mergeFrom(other)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

final class KmvPairBuffer(k: Int) {
  private val hs = new Array[Long](k)
  private val vs = new Array[Double](k)
  private var n = 0

  def size: Int = n
  def hash(i: Int): Long = hs(i)
  def value(i: Int): Double = vs(i)

  def insert(h: Long, v: Double): Unit = {
    if (n == k && h >= hs(n - 1)) return
    val idx = java.util.Arrays.binarySearch(hs, 0, n, h)
    if (idx >= 0) return // duplicate hash: first occurrence stays
    val at = -idx - 1
    val last = if (n < k) n else n - 1
    System.arraycopy(hs, at, hs, at + 1, last - at)
    System.arraycopy(vs, at, vs, at + 1, last - at)
    hs(at) = h
    vs(at) = v
    if (n < k) n += 1
  }

  def appendSorted(h: Long, v: Double): Unit = { hs(n) = h; vs(n) = v; n += 1 }

  def mergeFrom(other: KmvPairBuffer): Unit = {
    var i = 0
    while (i < other.n && !(n == k && other.hs(i) >= hs(n - 1))) {
      insert(other.hs(i), other.vs(i))
      i += 1
    }
  }
}

/** Bottom-k-by-hash UNIFORM ROW SAMPLE sketch (min-wise sampling): keeps
  * the (hash, value) pairs with the `k` smallest distinct hashes of a
  * unique row key and evaluates to array<struct<h:bigint, v:double>>
  * sorted by hash. With a uniform key hash the survivors are a uniform
  * k-sample of the rows — order statistics over the sampled values
  * estimate any quantile with bounded state, and the sketch is
  * MERGEABLE (bottom-k of a union = bottom-k of the bottom-ks), so the
  * partial aggregate ships k pairs per group however large the group:
  * the portable, deterministic counterpart of an engine-native quantile
  * sketch (Greenwald–Khanna here, t-digest elsewhere), reproducible in
  * any engine with md5. Null hashes or values are skipped.
  */
/** Shared machinery of the pair-sample aggregates: the k-capped
  * (hash, value) buffer, its lossless merge, the array<struct<h, v>>
  * evaluation, and the sorted binary serialization. Mirrors
  * [[KmvBufferAgg]] for the value-carrying buffer.
  */
sealed trait KmvPairBufferAgg extends TypedImperativeAggregate[KmvPairBuffer] {
  def k: Int

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvPairBuffer = new KmvPairBuffer(k)

  override def merge(b1: KmvPairBuffer, b2: KmvPairBuffer): KmvPairBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: KmvPairBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.hash(i), buf.value(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: KmvPairBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hash(i)); bb.putDouble(buf.value(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvPairBuffer = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.appendSorted(bb.getLong, bb.getDouble)
    buf
  }
}

case class KmvSampleAgg(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvPairBufferAgg
    with BinaryLike[Expression] {
  require(k >= 2, "k must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint hash, double value), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def prettyName: String = "graft_kmv_sample"

  override def update(buf: KmvPairBuffer, input: InternalRow): KmvPairBuffer = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      buf.insert(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KmvSampleAgg = copy(left = newLeft, right = newRight)
}

/** Union of [[KmvSampleAgg]] sample sketches (array<struct<h, v>>
  * columns) back into one bottom-k sample: by the same merge law as
  * the distinct sketch — the bottom-k of a union is the bottom-k of
  * the bottom-ks — a two-level GROUP BY (per-day samples in an inner
  * query, merged per-key in an outer one) yields EXACTLY the sample a
  * single pass over the raw rows would keep, so quantile rollups
  * answer from kilobyte sketches without re-scanning values. Nulls
  * (column or element) are skipped; input arrays need not be sorted.
  */
case class KmvSampleMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvPairBufferAgg
    with UnaryLike[Expression] {
  require(k >= 2, "k must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fields.length == 2 && st.fields(0).dataType == LongType &&
          st.fields(1).dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<h: bigint, v: double>> (a " +
        s"sample sketch), got ${other.simpleString}")
  }
  override def prettyName: String = "graft_kmv_sample_merge"

  override def update(buf: KmvPairBuffer, input: InternalRow): KmvPairBuffer = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getStruct(i, 2)
          buf.insert(s.getLong(0), s.getDouble(1))
        }
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSampleMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSampleMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSampleMergeAgg = copy(child = newChild)
}

/** Dot product of two array<double> columns (float arrays implicitly
  * cast). Sequential index-order accumulation — deterministic.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType.isInstanceOf[ArrayType] && c.dataType.asInstanceOf[ArrayType].elementType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double>, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GraftExpressions.V}.dot($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
}

/** Cosine similarity of two array<double> columns; 0.0 for zero vectors. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType.isInstanceOf[ArrayType] && c.dataType.asInstanceOf[ArrayType].elementType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double>, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GraftExpressions.V}.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
}

/** BPE token count of a whitespace-tokenized text under a trained merge
  * table ([[graft.operators.TextAnalysisOps.trainBpe]]) — tokenizer-aware
  * corpus accounting ("how many tokens is this, under OUR tokenizer")
  * rather than whitespace word counts. The merge table (rank-ordered
  * space-separated `"a b"` pair strings, exactly trainBpe's output and
  * BpeImpl.buildRank's key format) is a constructor constant, so counting is a
  * zero-shuffle narrow map; CodegenFallback (one virtual call per row
  * into the imperative merge loop).
  */
case class BpeTokenCount(child: Expression, merges: Array[String])
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"
  @transient private lazy val rank = BpeImpl.buildRank(merges)
  override protected def nullSafeEval(s: Any): Any =
    BpeImpl.tokenCount(s.asInstanceOf[UTF8String], rank)
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Unicode NFC normalization (java.text.Normalizer) — composes
  * decomposed sequences (e + U+0301 → é) so byte-level hashing and
  * dedup see one canonical form. CodegenFallback: the ICU-style
  * normalization pass dominates; a virtual call per row is noise.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Product-quantization encode: vector → m codebook codes (array<bigint>).
  * The codebook travels as a constructor constant (a model artifact,
  * like [[graft.operators.VectorSearchOps.ivfTopK]]'s centroid literals)
  * so encoding is a zero-shuffle narrow map. CodegenFallback: one
  * virtual call per row into an imperative kernel — the per-element
  * work is already loop-free of boxing.
  */
case class PqEncode(child: Expression, codebook: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression with CodegenFallback {
  require(m >= 1 && ksub >= 1 && ksub <= 256, "need 1 <= ksub <= 256")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    VectorImpl.pqEncode(v.asInstanceOf[ArrayData], codebook, m, ksub)
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Product-quantization query LUT: query vector → flat [m][ksub] table
  * of subvector·centroid dot products (over the normalized query). */
case class PqLut(child: Expression, codebook: Array[Double], m: Int, ksub: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"
  override protected def nullSafeEval(v: Any): Any =
    VectorImpl.pqLut(v.asInstanceOf[ArrayData], codebook, m, ksub)
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Asymmetric PQ distance: Σ_j lut[j·ksub + code_j] ≈ cosine. */
case class PqAdc(codes: Expression, lut: Expression, ksub: Int)
    extends BinaryExpression {
  override def left: Expression = codes
  override def right: Expression = lut
  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<double>), got " +
          s"${a.simpleString}, ${b.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override protected def nullSafeEval(c: Any, l: Any): Any =
    VectorImpl.pqAdc(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"${GraftExpressions.V}.pqAdc($c, $l, $ksub)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdc = copy(codes = l, lut = r)
}

/** Sparse (bucket, weight) entry arrays → dense L2-normalized
  * float[dim]. One imperative pass per row; replaces the
  * map_from_entries + transform(sequence…) formulation whose per-index
  * interpreted map lookups dominated TF-IDF assembly (20 s → sub-second
  * at sf0.1).
  */
case class DenseNormalize(buckets: Expression, weights: Expression, dim: Int)
    extends BinaryExpression {
  require(dim >= 1 && dim <= (1 << 20), "dim must be in [1, 2^20]")
  override def left: Expression = buckets
  override def right: Expression = weights
  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(e: Expression): DataType = e.dataType match {
      case ArrayType(t, _) => t
      case _ => NullType
    }
    if (elem(buckets) == LongType && elem(weights) == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<double>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_dense_normalize"
  override protected def nullSafeEval(b: Any, w: Any): Any =
    VectorImpl.denseNormalize(
      b.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, w) => s"${GraftExpressions.V}.denseNormalize($b, $w, $dim)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DenseNormalize = copy(buckets = l, weights = r)
}

/** Random-hyperplane LSH bucket id (long with `numBits` sign bits) for a
  * dense vector; hyperplanes derived deterministically from `seed`.
  */
case class HyperplaneBucket(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression {
  require(numBits > 0 && numBits <= 63, "numBits must be in [1, 63]")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] && child.dataType.asInstanceOf[ArrayType].elementType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"
  override protected def nullSafeEval(a: Any): Any =
    VectorImpl.hyperplaneBucket(a.asInstanceOf[ArrayData], numBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"${GraftExpressions.V}.hyperplaneBucket($c, $numBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}
