package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{
  AggregateWindowFunction, AttributeReference, Cast, Expression, Greatest,
  If, IsNull, Literal}
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially-weighted moving average over a running window:
  * `y_i = alpha * x_i + (1 - alpha) * y_(i-1)`, seeded with the first
  * non-null observation (`y_1 = x_1`); a null input leaves the state
  * unchanged and emits the last smoothed value (LOCF-style), matching
  * the usual ewma-over-gappy-series convention.
  *
  * An [[AggregateWindowFunction]]: the frame is pinned to
  * `ROWS UNBOUNDED PRECEDING .. CURRENT ROW`, which Spark's window
  * executor evaluates incrementally — one declarative update per row,
  * O(n) per partition, no per-row frame rescan. The recurrence is two
  * IEEE multiplies and one add per step, so results are bit-identical
  * to any engine computing the same recurrence in doubles.
  *
  * The reference engine has no smoothing functions (its window loop is
  * sum/avg/min/max only, executor.go:239-252); this is the time-series
  * extension tier.
  */
case class Ewma(child: Expression, alpha: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(alpha > 0.0 && alpha <= 1.0, "ewma alpha must be in (0, 1]")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_ewma"

  private lazy val x = Cast(child, DoubleType)
  private lazy val y =
    AttributeReference("y", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = y :: Nil
  override val initialValues: Seq[Expression] =
    Literal.create(null, DoubleType) :: Nil
  override lazy val updateExpressions: Seq[Expression] =
    If(IsNull(x), y,
      If(IsNull(y), x,
        Literal(alpha) * x + Literal(1.0 - alpha) * y)) :: Nil
  override lazy val evaluateExpression: Expression = y

  override protected def withNewChildInternal(newChild: Expression): Ewma =
    copy(child = newChild)
}

/** One-sided tabular CUSUM over a running window — the changepoint
  * statistic (Page 1954): accumulate deviations beyond an allowed
  * slack around a target mean, floored at zero so in-control stretches
  * reset the evidence:
  *
  *   high side: s_i = max(0, s_(i-1) + (x_i − (target + slack)))
  *   low  side: s_i = max(0, s_(i-1) + ((target − slack) − x_i))
  *
  * An alarm is the user's threshold comparison over the emitted
  * statistic (`QUALIFY s > h` / `WHERE`), not baked in — the kernel is
  * the evidence accumulator. Seeded at 0 before any observation; a
  * null input leaves the state unchanged and emits the last value.
  *
  * Same execution shape as [[Ewma]]: a one-slot
  * [[AggregateWindowFunction]] on the pinned running ROWS frame, one
  * declarative update per row, O(n) per partition. Over integral
  * inputs with integral parameters every update is exact integer
  * arithmetic in doubles, and the recurrence equals the closed form
  * s_i = W_i − min(0, min_{j≤i} W_j) over the running deviation sum
  * W — which is how a SQL engine replays it with two running windows,
  * bit-identically.
  */
case class Cusum(child: Expression, target: Double, slack: Double,
    low: Boolean = false)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(java.lang.Double.isFinite(target) &&
    java.lang.Double.isFinite(slack), "cusum target/slack must be finite")
  require(slack >= 0.0, "cusum slack must be >= 0")

  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (low) "graft_cusum_low" else "graft_cusum"

  private lazy val x = Cast(child, DoubleType)
  private lazy val s =
    AttributeReference("s", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = s :: Nil
  override val initialValues: Seq[Expression] = Literal(0.0) :: Nil
  override lazy val updateExpressions: Seq[Expression] = {
    val dev: Expression =
      if (low) Literal(target - slack) - x else x - Literal(target + slack)
    If(IsNull(x), s,
      Greatest(Seq(Literal(0.0), s + dev))) :: Nil
  }
  override lazy val evaluateExpression: Expression = s

  override protected def withNewChildInternal(newChild: Expression): Cusum =
    copy(child = newChild)
}

/** Holt double-exponential smoothing (level + linear trend) over a
  * running window:
  *
  *   l_i = alpha * x_i + (1 - alpha) * (l_(i-1) + b_(i-1))
  *   b_i = beta * (l_i - l_(i-1)) + (1 - beta) * b_(i-1)
  *
  * seeded at the first non-null observation with `l_1 = x_1, b_1 = 0`
  * (the zero-trend seed — deterministic for a 1-point series, unlike
  * the x_2 − x_1 textbook seed which needs lookahead). Emits the
  * smoothed level, or the one-step-ahead forecast `l_i + b_i` when
  * `forecast` is set — the "where is this metric heading" tier that
  * single-exponential [[Ewma]] (which lags any trending series) cannot
  * answer. A null input leaves the (level, trend) state unchanged.
  *
  * Same execution shape as [[Ewma]]: an [[AggregateWindowFunction]]
  * with a two-slot buffer, one declarative update per row, O(n) per
  * partition. The recurrence is a fixed IEEE sequence — the trend
  * update re-derives l_i with the identical expression, so an engine
  * replaying the same arithmetic (e.g. a recursive CTE) matches bit
  * for bit.
  */
case class Holt(child: Expression, alpha: Double, beta: Double,
    forecast: Boolean = false)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(alpha > 0.0 && alpha <= 1.0, "holt alpha must be in (0, 1]")
  require(beta >= 0.0 && beta <= 1.0, "holt beta must be in [0, 1]")

  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (forecast) "graft_holt_forecast" else "graft_holt"

  private lazy val x = Cast(child, DoubleType)
  private lazy val l =
    AttributeReference("l", DoubleType, nullable = true)()
  private lazy val b =
    AttributeReference("b", DoubleType, nullable = true)()

  // the new level, in terms of the OLD buffer (update expressions all
  // read pre-update state; the trend update inlines the same tree)
  private def lNext: Expression =
    Literal(alpha) * x + Literal(1.0 - alpha) * (l + b)

  override def aggBufferAttributes: Seq[AttributeReference] = l :: b :: Nil
  override val initialValues: Seq[Expression] =
    Literal.create(null, DoubleType) :: Literal.create(null, DoubleType) :: Nil
  override lazy val updateExpressions: Seq[Expression] =
    If(IsNull(x), l, If(IsNull(l), x, lNext)) ::
    If(IsNull(x), b, If(IsNull(l), Literal(0.0),
      Literal(beta) * (lNext - l) + Literal(1.0 - beta) * b)) :: Nil
  override lazy val evaluateExpression: Expression =
    if (forecast) l + b else l

  override protected def withNewChildInternal(newChild: Expression): Holt =
    copy(child = newChild)
}

/** Holt-Winters ADDITIVE triple-exponential smoothing — level + linear
  * trend + a `period`-slot seasonal cycle — over a running window:
  *
  *   l_i = alpha * (x_i - s_(i-p)) + (1 - alpha) * (l_(i-1) + b_(i-1))
  *   b_i = beta * (l_i - l_(i-1)) + (1 - beta) * b_(i-1)
  *   s_i = gamma * (x_i - l_i) + (1 - gamma) * s_(i-p)
  *
  * seeded at the first non-null observation with `l = x, b = 0` and all
  * seasonal slots 0 (the streaming-friendly seed, matching [[Holt]]'s
  * zero-trend convention: the textbook one-full-season seed needs
  * lookahead; here seasonality is LEARNED through gamma over the first
  * cycles, and the recurrence degenerates to exactly [[Holt]] while the
  * slots are still zero). The seasonal index advances only on non-null
  * observations; a null input leaves all state unchanged and re-emits
  * the previous fit.
  *
  * Emits the seasonal FIT `l_i + s_i` (the deseasonalized level plus
  * this index's just-updated seasonal), or the one-step-ahead forecast
  * `l_i + b_i + s_(i+1-p)` when `forecast` is set — "what should the
  * NEXT point be, given trend and where we are in the cycle".
  *
  * Execution shape: an [[AggregateWindowFunction]] with a
  * (level, trend, counter, period × seasonal-slot) buffer — one
  * declarative update per row, O(n·period) expression nodes per step
  * (the slot dispatch is a nested conditional over the literal period,
  * which is why `period` is capped at 24: day-of-week 7, month-of-year
  * 12 and hour-of-day 24 cycles all fit, and the generated update stays
  * comfortably under codegen limits). Every step is a fixed IEEE
  * sequence, so an engine replaying the same arithmetic (a recursive
  * CTE carrying the slot list) matches bit for bit.
  */
case class HoltWinters(child: Expression, alpha: Double, beta: Double,
    gamma: Double, period: Int, forecast: Boolean = false)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(alpha > 0.0 && alpha <= 1.0, "holt_winters alpha must be in (0, 1]")
  require(beta >= 0.0 && beta <= 1.0, "holt_winters beta must be in [0, 1]")
  require(gamma >= 0.0 && gamma <= 1.0, "holt_winters gamma must be in [0, 1]")
  require(period >= 2 && period <= 24,
    "holt_winters period must be in [2, 24]")

  import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EqualTo, Not, Pmod}
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (forecast) "graft_holt_winters_forecast" else "graft_holt_winters"

  private lazy val x = Cast(child, DoubleType)
  private lazy val l =
    AttributeReference("l", DoubleType, nullable = true)()
  private lazy val b =
    AttributeReference("b", DoubleType, nullable = true)()
  // non-null observations seen so far; the seasonal index is n mod p
  private lazy val n =
    AttributeReference("n", LongType, nullable = false)()
  private lazy val s = (0 until period).map(k =>
    AttributeReference(s"s$k", DoubleType, nullable = false)())

  private def pm(e: Expression): Expression =
    Pmod(e, Literal(period.toLong))
  // value of seasonal slot (idx mod p), read from the given buffer view
  private def slotAt(idx: Expression): Expression =
    CaseWhen(
      (0 until period).map(k =>
        (EqualTo(pm(idx), Literal(k.toLong)): Expression, s(k): Expression)),
      None)
  // the current observation's stored seasonal (pre-update state)
  private lazy val sj = slotAt(n)
  // the new level in terms of the OLD buffer; the trend and seasonal
  // updates inline the identical tree (pre-update-state semantics)
  private def lNext: Expression =
    Literal(alpha) * (x - sj) + Literal(1.0 - alpha) * (l + b)

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(l, b, n) ++ s
  override val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal.create(null, DoubleType),
      Literal(0L)) ++ Seq.fill(period)(Literal(0.0))
  override lazy val updateExpressions: Seq[Expression] =
    Seq(
      If(IsNull(x), l, If(IsNull(l), x, lNext)),
      If(IsNull(x), b, If(IsNull(l), Literal(0.0),
        Literal(beta) * (lNext - l) + Literal(1.0 - beta) * b)),
      If(IsNull(x), n, n + Literal(1L))) ++
    (0 until period).map { k =>
      // only the current index's slot moves; the seed row leaves the
      // zero slots in place (gamma*(x - x) contributes nothing)
      If(IsNull(x) || Not(EqualTo(pm(n), Literal(k.toLong))), s(k),
        If(IsNull(l), s(k),
          Literal(gamma) * (x - lNext) + Literal(1.0 - gamma) * s(k)))
    }
  // evaluate reads the POST-update buffer: the current row's slot is
  // (n - 1) mod p, the next observation's is n mod p
  override lazy val evaluateExpression: Expression =
    if (forecast) l + b + slotAt(n) else l + slotAt(n - Literal(1L))

  override protected def withNewChildInternal(
      newChild: Expression): HoltWinters = copy(child = newChild)
}

/** Running affine chain `y_i = coef_i · y_(i-1) + offset_i`, seeded at
  * the first row with `seed_i` (the value the chain takes when there is
  * no previous state). The stitch step of two-phase parallel
  * decompositions of linear recurrences: any sequential scan of the
  * form y = a·y + b (EWMA, decaying counters) splits into per-bucket
  * partial scans that compose affinely — this kernel runs the
  * per-bucket composition in one O(#buckets) pass per key
  * ([[graft.operators.TimeSeriesOps.ewmaBucketed]]). Null coef/offset
  * rows carry the state unchanged.
  */
case class AffineScan(coef: Expression, offset: Expression,
    seed: Expression)
    extends AggregateWindowFunction with TernaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_affine_scan"

  override def first: Expression = coef
  override def second: Expression = offset
  override def third: Expression = seed

  private lazy val a = Cast(coef, DoubleType)
  private lazy val b = Cast(offset, DoubleType)
  private lazy val s = Cast(seed, DoubleType)
  private lazy val y =
    AttributeReference("y", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = y :: Nil
  override val initialValues: Seq[Expression] =
    Literal.create(null, DoubleType) :: Nil
  override lazy val updateExpressions: Seq[Expression] =
    If(IsNull(y), s, If(IsNull(a * b), y, a * y + b)) :: Nil
  override lazy val evaluateExpression: Expression = y

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AffineScan =
    copy(coef = newFirst, offset = newSecond, seed = newThird)
}

/** In-bucket HOLT scan state for the bucket-then-stitch decomposition
  * of double-exponential smoothing — [[Holt]]'s recurrence is LINEAR in
  * the (level, trend) state vector v: v_i = M·v_(i-1) + c·x_i with
  *
  *   M = [[1-α, 1-α], [-αβ, 1-αβ]],  c = (α, αβ)
  *
  * so a bucket composes affinely (v_end = M^n·v_in + d) and a hot key
  * can fan out over its time buckets exactly like the EWMA stitch
  * ([[AffineScan]]) — only the carried state is 2-dimensional. This
  * kernel runs the SEEDED in-bucket recurrence (l = x₁, b = 0 at the
  * first non-null observation — identical arithmetic to [[Holt]]) and
  * simultaneously accumulates the running matrix power P_i = M^(k-1)
  * (k = non-null observations so far): P is exactly the sensitivity of
  * the state to a different step-1 seed, which is what the stitch's
  * per-row correction needs (v_true = v_seeded + P·Δ₁). Emits a
  * six-field struct (l, b, p11, p12, p21, p22); null inputs leave all
  * state unchanged (the [[Holt]] LOCF convention).
  */
case class HoltScan(child: Expression, alpha: Double, beta: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(alpha > 0.0 && alpha <= 1.0, "holt alpha must be in (0, 1]")
  require(beta >= 0.0 && beta <= 1.0, "holt beta must be in [0, 1]")

  import org.apache.spark.sql.catalyst.expressions.CreateNamedStruct
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("l", DoubleType), StructField("b", DoubleType),
    StructField("p11", DoubleType), StructField("p12", DoubleType),
    StructField("p21", DoubleType), StructField("p22", DoubleType)))
  override def prettyName: String = "graft_holt_scan"

  private val m11 = 1.0 - alpha
  private val m12 = 1.0 - alpha
  private val m21 = -(alpha * beta)
  private val m22 = 1.0 - alpha * beta

  private lazy val x = Cast(child, DoubleType)
  private lazy val l = AttributeReference("l", DoubleType, nullable = true)()
  private lazy val b = AttributeReference("b", DoubleType, nullable = true)()
  private lazy val p11 = AttributeReference("p11", DoubleType, nullable = true)()
  private lazy val p12 = AttributeReference("p12", DoubleType, nullable = true)()
  private lazy val p21 = AttributeReference("p21", DoubleType, nullable = true)()
  private lazy val p22 = AttributeReference("p22", DoubleType, nullable = true)()

  private def lNext: Expression =
    Literal(alpha) * x + Literal(1.0 - alpha) * (l + b)

  override def aggBufferAttributes: Seq[AttributeReference] =
    l :: b :: p11 :: p12 :: p21 :: p22 :: Nil
  override val initialValues: Seq[Expression] =
    Seq.fill(6)(Literal.create(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(x), l, If(IsNull(l), x, lNext)),
    If(IsNull(x), b, If(IsNull(l), Literal(0.0),
      Literal(beta) * (lNext - l) + Literal(1.0 - beta) * b)),
    If(IsNull(x), p11, If(IsNull(l), Literal(1.0),
      p11 * Literal(m11) + p12 * Literal(m21))),
    If(IsNull(x), p12, If(IsNull(l), Literal(0.0),
      p11 * Literal(m12) + p12 * Literal(m22))),
    If(IsNull(x), p21, If(IsNull(l), Literal(0.0),
      p21 * Literal(m11) + p22 * Literal(m21))),
    If(IsNull(x), p22, If(IsNull(l), Literal(1.0),
      p21 * Literal(m12) + p22 * Literal(m22))))
  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("l"), l, Literal("b"), b,
    Literal("p11"), p11, Literal("p12"), p12,
    Literal("p21"), p21, Literal("p22"), p22))

  override protected def withNewChildInternal(newChild: Expression): HoltScan =
    copy(child = newChild)
}

/** In-bucket HOLT-WINTERS scan state for the bucket-then-stitch
  * decomposition of ADDITIVE triple-exponential smoothing —
  * [[HoltWinters]]'s recurrence is LINEAR in the (2+p)-dimensional
  * state v = (l, b, s_0..s_(p-1)): v_i = M_j·v_(i-1) + c_j·x_i, where
  * the step matrix M_j depends ONLY on which seasonal slot
  * j = (global observation count) mod p the step reads — so a bucket
  * still composes affinely (v_end = P·v_in + d) and a hot key fans out
  * over its time buckets exactly like [[HoltScan]], provided each
  * bucket knows its ENTRY PHASE φ (global observations before it,
  * mod p): `phase` is that per-bucket column (constant within the
  * window partition), threaded in by
  * [[graft.operators.TimeSeriesOps.holtWintersStitched]] from a
  * bucket-summary prefix count.
  *
  * Step at slot j (the [[HoltWinters]] arithmetic verbatim):
  *   l' = α(x − s_j) + (1−α)(l + b)
  *   b' = β(l' − l) + (1−β)b
  *   s_j' = γ(x − l') + (1−γ)s_j
  * which as a matrix has rows l' = (1−α)l + (1−α)b + (−α)s_j,
  * b' = (−αβ)l + (1−αβ)b + (−αβ)s_j,
  * s_j' = (−γ(1−α))l + (−γ(1−α))b + (γα+1−γ)s_j, other slots identity.
  *
  * The kernel runs the SEEDED in-bucket recurrence (l = x₁, b = 0,
  * slots stay 0 at the first non-null observation) and simultaneously
  * LEFT-accumulates the running matrix product P_i = M_(j_i)·P_(i-1)
  * over steps 2..i (P = I at the seed): P_i is the sensitivity of the
  * state to a different step-1 seed, which is what the stitch's
  * per-row correction needs (v_true = v_seeded + P·Δ₁). Emits a struct
  * (l, b, n, s: array[p], p: array[(2+p)²] row-major); null inputs
  * leave all state unchanged (the [[HoltWinters]] LOCF convention).
  *
  * `period` is capped at 8 here (vs the single-pass kernel's 24):
  * the buffer is (2+p)(3+p) slots and the update expressions must stay
  * codegen-bounded — day-of-week 7 fits; hour-of-day cycles belong to
  * the single-pass form.
  */
case class HwScan(child: Expression, phase: Expression, alpha: Double,
    beta: Double, gamma: Double, period: Int)
    extends AggregateWindowFunction {
  require(alpha > 0.0 && alpha <= 1.0, "holt_winters alpha must be in (0, 1]")
  require(beta >= 0.0 && beta <= 1.0, "holt_winters beta must be in [0, 1]")
  require(gamma >= 0.0 && gamma <= 1.0, "holt_winters gamma must be in [0, 1]")
  require(period >= 2 && period <= 8,
    "stitched holt_winters period must be in [2, 8]")

  import org.apache.spark.sql.catalyst.expressions.{
    CaseWhen, CreateArray, CreateNamedStruct, EqualTo, Not, Pmod}
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField,
    StructType}

  private val dim = 2 + period

  override def children: Seq[Expression] = Seq(child, phase)
  override def dataType: DataType = StructType(Seq(
    StructField("l", DoubleType), StructField("b", DoubleType),
    StructField("n", LongType),
    StructField("s", ArrayType(DoubleType)),
    StructField("p", ArrayType(DoubleType))))
  override def prettyName: String = "graft_hw_scan"

  // step-matrix coefficients (see scaladoc): row l, row b, row s_j
  private val a1 = 1.0 - alpha
  private val a2 = -alpha
  private val b1 = -(alpha * beta)
  private val b2 = 1.0 - alpha * beta
  private val b3 = -(alpha * beta)
  private val g1 = -(gamma * (1.0 - alpha))
  private val g2 = gamma * alpha + 1.0 - gamma

  private lazy val x = Cast(child, DoubleType)
  private lazy val ph = Cast(phase, LongType)
  private lazy val l = AttributeReference("l", DoubleType, nullable = true)()
  private lazy val b = AttributeReference("b", DoubleType, nullable = true)()
  private lazy val n = AttributeReference("n", LongType, nullable = false)()
  private lazy val s = (0 until period).map(k =>
    AttributeReference(s"s$k", DoubleType, nullable = false)())
  // running matrix product, row-major; null until the seed writes I
  private lazy val p = (0 until dim).map(r => (0 until dim).map(c =>
    AttributeReference(s"p${r}_$c", DoubleType, nullable = true)()))

  // slot the CURRENT observation reads: (φ + local obs count) mod p
  private def jj: Expression = Pmod(ph + n, Literal(period.toLong))
  private def slotAt(idx: Expression,
      views: Seq[Expression]): Expression =
    CaseWhen((0 until period).map(k =>
      (EqualTo(Pmod(idx, Literal(period.toLong)),
        Literal(k.toLong)): Expression, views(k))), None)
  private lazy val sj = slotAt(jj, s)
  private def lNext: Expression =
    Literal(alpha) * (x - sj) + Literal(1.0 - alpha) * (l + b)

  override def aggBufferAttributes: Seq[AttributeReference] =
    Seq(l, b, n) ++ s ++ p.flatten
  override val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal.create(null, DoubleType),
      Literal(0L)) ++ Seq.fill(period)(Literal(0.0)) ++
      Seq.fill(dim * dim)(Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = {
    // P column c of the slot row the current step reads
    def pjj(c: Int): Expression = slotAt(jj, (0 until period).map(m => p(2 + m)(c)))
    val stateUp: Seq[Expression] = Seq(
      If(IsNull(x), l, If(IsNull(l), x, lNext)),
      If(IsNull(x), b, If(IsNull(l), Literal(0.0),
        Literal(beta) * (lNext - l) + Literal(1.0 - beta) * b)),
      If(IsNull(x), n, n + Literal(1L))) ++
      (0 until period).map { k =>
        If(IsNull(x) || Not(EqualTo(jj, Literal(k.toLong))), s(k),
          If(IsNull(l), s(k),
            Literal(gamma) * (x - lNext) + Literal(1.0 - gamma) * s(k)))
      }
    // P' = M_jj · P: only rows l, b, s_jj move; seed writes the identity
    val pUp: Seq[Expression] = (0 until dim).flatMap { r =>
      (0 until dim).map { c =>
        val seeded = Literal(if (r == c) 1.0 else 0.0)
        val stepped: Expression = r match {
          case 0 =>
            Literal(a1) * p(0)(c) + Literal(a1) * p(1)(c) +
              Literal(a2) * pjj(c)
          case 1 =>
            Literal(b1) * p(0)(c) + Literal(b2) * p(1)(c) +
              Literal(b3) * pjj(c)
          case _ =>
            val m = r - 2
            If(Not(EqualTo(jj, Literal(m.toLong))), p(r)(c),
              Literal(g1) * p(0)(c) + Literal(g1) * p(1)(c) +
                Literal(g2) * p(r)(c))
        }
        If(IsNull(x), p(r)(c), If(IsNull(l), seeded, stepped))
      }
    }
    stateUp ++ pUp
  }

  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("l"), l, Literal("b"), b, Literal("n"), n,
    Literal("s"), CreateArray(s),
    Literal("p"), CreateArray(p.flatten)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HwScan =
    copy(child = newChildren(0), phase = newChildren(1))
}

/** Running N-DIMENSIONAL affine chain — [[AffineScan]]'s array-typed
  * sibling for stitching the (2+p)-state [[HwScan]] decomposition: per
  * input row (one per bucket), y = A·y_prev + d with A a row-major
  * `dim`×`dim` array and d a `dim` array; a row arriving with no prior
  * state takes its seed array (which may itself be null — an all-null
  * leading bucket has no state to seed, and the next real bucket's
  * seed takes over). Each output component is the left-folded product
  * sum Σ_c A[r·dim+c]·y_c followed by + d[r] — the association the
  * decomposition-replay oracle mirrors. Emits array[dim].
  */
case class AffineArrScan(a: Expression, d: Expression, s: Expression,
    dim: Int) extends AggregateWindowFunction
    with TernaryLike[Expression] {
  require(dim >= 1 && dim <= 32, "AffineArrScan dim must be in [1, 32]")

  import org.apache.spark.sql.catalyst.expressions.{CreateArray, GetArrayItem}
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "graft_affine_arr_scan"

  override def first: Expression = a
  override def second: Expression = d
  override def third: Expression = s

  private lazy val y = (0 until dim).map(r =>
    AttributeReference(s"y$r", DoubleType, nullable = true)())
  private def at(arr: Expression, i: Int): Expression =
    GetArrayItem(arr, Literal(i, IntegerType))

  override def aggBufferAttributes: Seq[AttributeReference] = y
  override val initialValues: Seq[Expression] =
    Seq.fill(dim)(Literal.create(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] =
    (0 until dim).map { r =>
      val stepped = (0 until dim).map(c =>
        (at(a, r * dim + c) * y(c)): Expression).reduceLeft(_ + _) + at(d, r)
      If(IsNull(y.head), at(s, r), stepped)
    }
  override lazy val evaluateExpression: Expression = CreateArray(y)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AffineArrScan =
    copy(a = newFirst, d = newSecond, s = newThird)
}

/** Running TWO-DIMENSIONAL affine chain — [[AffineScan]]'s 2×2 sibling
  * for stitching 2-state linear recurrences ([[Holt]]): per input row
  * (one per bucket), y = A·y_prev + d with A = (a11 a12; a21 a22) and
  * d = (d1, d2); a row arriving with no prior state takes its seed
  * (s1, s2) — which may itself be null (an all-null leading bucket has
  * no state to seed). Emits struct(y1, y2).
  */
case class Affine2Scan(a11: Expression, a12: Expression, a21: Expression,
    a22: Expression, d1: Expression, d2: Expression,
    s1: Expression, s2: Expression)
    extends AggregateWindowFunction {

  import org.apache.spark.sql.catalyst.expressions.CreateNamedStruct
  import org.apache.spark.sql.types.{StructField, StructType}

  override def children: Seq[Expression] =
    Seq(a11, a12, a21, a22, d1, d2, s1, s2)
  override def dataType: DataType = StructType(Seq(
    StructField("y1", DoubleType), StructField("y2", DoubleType)))
  override def prettyName: String = "graft_affine2_scan"

  private lazy val ca11 = Cast(a11, DoubleType)
  private lazy val ca12 = Cast(a12, DoubleType)
  private lazy val ca21 = Cast(a21, DoubleType)
  private lazy val ca22 = Cast(a22, DoubleType)
  private lazy val cd1 = Cast(d1, DoubleType)
  private lazy val cd2 = Cast(d2, DoubleType)
  private lazy val y1 = AttributeReference("y1", DoubleType, nullable = true)()
  private lazy val y2 = AttributeReference("y2", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = y1 :: y2 :: Nil
  override val initialValues: Seq[Expression] =
    Seq.fill(2)(Literal.create(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(y1), Cast(s1, DoubleType),
      ca11 * y1 + ca12 * y2 + cd1),
    If(IsNull(y1), Cast(s2, DoubleType),
      ca21 * y1 + ca22 * y2 + cd2))
  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("y1"), y1, Literal("y2"), y2))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Affine2Scan =
    Affine2Scan(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5), newChildren(6),
      newChildren(7))
}
