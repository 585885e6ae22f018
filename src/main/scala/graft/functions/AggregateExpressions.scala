package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Coalesce, EqualTo, Expression, If, IsNull, Least, LessThan, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** `sum_at_min(value, ord)` — the sum of `value` over exactly the rows
  * whose `ord` equals the group minimum, in ONE aggregation pass.
  *
  * Why a custom aggregate: "quantity at the floor price" (mart G5)
  * needs the min before it can condition the sum, so with built-ins it
  * costs either a window-min over the fact table (WindowExec = full
  * sort of every group) or a (keys, ord) pre-aggregation plus a second
  * shuffle. Neither survives a 100 TB fact table gracefully. As a
  * [[DeclarativeAggregate]] the state is two longs — (running min,
  * running sum at that min) — updated with pure expressions inside
  * whole-stage codegen'd HashAggregate, with map-side partials and a
  * single grain-key shuffle, no sort anywhere. (Same "built-ins can't
  * express it in one pass" justification as [[FloatVectorDot]];
  * reference semantics: `models.py:86-97` quantity_at_floor.)
  *
  * Null semantics, mirroring `min` + a conditional `sum`:
  *  - rows with null `ord` never contribute (to the min or the sum);
  *  - null `value` at the min counts as 0 (sum skips nulls);
  *  - a group with no non-null `ord` evaluates to NULL (callers
  *    wanting 0 coalesce, exactly as with `sum(CASE ...)` over an
  *    empty match set... which yields 0 only because the CASE arm
  *    feeds 0s — our NULL is the honest `min`-like answer).
  *
  * Update/merge expressions read the PRE-update buffer: Spark's
  * mutable projections (interpreted and generated) evaluate every
  * expression before writing any buffer slot, the same contract
  * Spark's own `First`/`Average` rely on.
  */
case class SumAtMin(value: Expression, ord: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = value
  override def right: Expression = ord

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "sum_at_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && ord.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT value, BIGINT ord), " +
          s"got ${value.dataType.sql} and ${ord.dataType.sql}")

  private lazy val minOrd = AttributeReference("minOrd", LongType)()
  private lazy val sumAt = AttributeReference("sumAt", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(minOrd, sumAt)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, LongType), Literal(0L))

  // null value counts as 0 at the floor (sum-like null skipping)
  private def valueOrZero: Expression = Coalesce(Seq(value, Literal(0L)))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    // Least skips nulls: null ord keeps the current min, null min
    // adopts ord
    Least(Seq(minOrd, ord)),
    If(IsNull(ord), sumAt,
      If(IsNull(minOrd), valueOrZero,
        If(LessThan(ord, minOrd), valueOrZero, // strictly lower floor: restart
          If(EqualTo(ord, minOrd), Add(sumAt, valueOrZero), sumAt)))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Least(Seq(minOrd.left, minOrd.right)),
    If(IsNull(minOrd.right), sumAt.left,
      If(IsNull(minOrd.left), sumAt.right,
        If(LessThan(minOrd.left, minOrd.right), sumAt.left,
          If(LessThan(minOrd.right, minOrd.left), sumAt.right,
            Add(sumAt.left, sumAt.right))))))

  override lazy val evaluateExpression: Expression =
    If(IsNull(minOrd), Literal.create(null, LongType), sumAt)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SumAtMin =
    copy(value = newLeft, ord = newRight)
}

object AggregateFunctions {
  /** Column-level `sum_at_min` (inputs cast to BIGINT by the caller). */
  def sumAtMin(value: Column, ord: Column): Column =
    ColumnBridge.column(SumAtMin(
      ColumnBridge.expression(value),
      ColumnBridge.expression(ord)).toAggregateExpression())
}
