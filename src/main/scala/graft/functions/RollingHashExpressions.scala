package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling window hashes over a document's code points:
  * one polynomial hash (base 31, mod 1e9+7) per `window`-length
  * window, computed in O(n) by rolling (pop the outgoing code point,
  * push the incoming one) — the substrate for winnowing-style
  * document fingerprinting (local-minimum selection over these
  * hashes, MOSS-style) where md5-of-the-whole-doc is too coarse.
  *
  * Native expression for the same reason as [[FloatVectorDot]]: this
  * runs over every document at corpus-scan scale, and the higher-
  * order-function formulation is interpreted per element. The window
  * loop lives in [[RollingHash.compute]], a static helper both the
  * interpreted and generated paths call — the codegen emits a single
  * static call per row (no closures, no virtual dispatch) and stays
  * inside the whole-stage pipeline.
  *
  * Determinism: hashes are over Unicode CODE POINTS (not bytes /
  * UTF-16 units), with mod applied in a ring-homomorphic way, so a
  * per-window direct polynomial in any engine (e.g. DuckDB
  * `unicode(substr(...))` terms) reproduces them exactly.
  */
case class RollingWindowHashes(child: Expression, window: Int)
    extends UnaryExpression {

  require(window >= 1 && window <= 64,
    s"window=$window outside [1, 64]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.compute($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}

object RollingHash {
  val Base = 31L
  val Mod = 1000000007L

  /** O(n) rolling computation; bit-identical to the direct per-window
    * polynomial sum(cp_j * Base^(w-1-j)) % Mod.
    */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    // Base^(w-1) % Mod, for popping the outgoing code point
    var pw = 1L
    var i = 0
    while (i < w - 1) { pw = pw * Base % Mod; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (h * Base + cps(i)) % Mod; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - w) {
      h = (h - cps(i - 1) * pw % Mod + Mod) % Mod
      h = (h * Base + cps(i + w - 1)) % Mod
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

object RollingHashFunctions {
  /** Column of per-window rolling hashes (array<bigint>). */
  def rollingHashes(text: Column, window: Int = 8): Column =
    ColumnBridge.column(RollingWindowHashes(
      ColumnBridge.expression(text), window))
}
