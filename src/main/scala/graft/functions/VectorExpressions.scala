package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the embedding dot product.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions are
  * interpreted — no whole-stage codegen, a closure call per element —
  * and the dot product sits in the innermost loop of similarity
  * search (candidate-pairs x dimensions evaluations). This expression
  * generates a tight primitive `for` loop over the two float arrays
  * (and participates in whole-stage codegen), measured ~10x faster on
  * the in-bucket pair scoring at bench scale.
  *
  * Semantics: sum_i (double)a[i] * (double)b[i]; accumulation in
  * double, sequential order — matching both the HOF formulation and
  * the DuckDB oracle (`list_dot_product` on DOUBLE[] casts). Null
  * arrays — and MISMATCHED-length arrays (a malformed embedding; a
  * silent prefix dot product could rank into top-k results) —
  * propagate NULL, like the zip_with+aggregate formulation did.
  * Elements are assumed non-null (embedding vectors; a null element
  * reads as 0 rather than paying a per-element branch).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vector_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product over two ARRAY<INT> columns (long
  * result) — the scoring kernel for quantized embeddings
  * ([[graft.pipeline.Quantization]]). Same rationale and null/length
  * contract as [[FloatVectorDot]]; integer accumulation makes the
  * score associativity-free (bit-identical under any partitioning or
  * engine), which is what lets quantized rankings be hash-gated.
  * Codes are int8-range so the long accumulator cannot overflow
  * below ~2^47 dimensions.
  */
case class IntVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isIntArray(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (isIntArray(left.dataType) && isIntArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<INT> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "int_vector_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level dot product over two Array[Float] columns. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-level exact dot product over two Array[Int] columns. */
  def intVecDot(a: Column, b: Column): Column =
    ColumnBridge.column(IntVectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
