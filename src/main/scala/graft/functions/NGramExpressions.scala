package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram window generators for the shingling substrate —
  * the corpus-scan stage of every n-gram dedup operator.
  *
  * Why native: the HOF formulation (`transform(sequence(...), i =>
  * substr/concat_ws(...))`) is interpreted — a closure call and a
  * Column-expression eval per WINDOW per document, with no
  * whole-stage codegen. These expressions emit one static call per
  * row producing the whole window array in a tight loop.
  *
  * Semantics are pinned to the built-ins they replace —
  * [[CharNGrams]] windows are `UTF8String.substringSQL` (code-point
  * based, exactly `Column.substr`), [[WordNGrams]] joins are
  * `UTF8String.concatWs` (exactly `concat_ws`) — so swapping the
  * implementation cannot change any gate output.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n=$n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NGrams.charWindows(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGrams.charWindows($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

/** Joins each window of `n` consecutive array elements with `sep` —
  * the word-shingle generator over a pre-tokenized array.
  */
case class WordNGrams(child: Expression, n: Int, sep: String)
    extends UnaryExpression {

  require(n >= 1, s"n=$n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NGrams.wordWindows(input.asInstanceOf[ArrayData],
      UTF8String.fromString(sep), n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", UTF8String.fromString(sep))
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGrams.wordWindows($c, $sepRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object NGrams {
  private val Empty = new GenericArrayData(new Array[Any](0))

  def charWindows(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return Empty
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordWindows(arr: ArrayData, sep: UTF8String, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return Empty
    val out = new Array[Any](len - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object NGramFunctions {
  def charNGrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNGrams(ColumnBridge.expression(text), n))

  def wordNGrams(tokens: Column, n: Int, sep: String = " "): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(tokens), n, sep))
}
