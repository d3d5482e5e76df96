package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{
  AggregateWindowFunction, AttributeReference, Cast, Expression, If, IsNull,
  Literal}
import org.apache.spark.sql.catalyst.trees.UnaryLike
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
