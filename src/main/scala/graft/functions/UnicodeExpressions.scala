package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization for corpus text cleaning.
  *
  * Spark has NO normalization builtin, and a corpus assembled from
  * real crawls mixes composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) encodings of the SAME text — exact dedup hashes,
  * shingles, tokenizers and equality joins all silently treat them
  * as different documents unless a normalization pass runs first.
  * Standard curation pipelines therefore NFC/NFKC-normalize before
  * anything hashes the text.
  *
  * Why native: the only JVM route is `java.text.Normalizer`, and a
  * Scala UDF would ser/deser every row and block whole-stage codegen
  * on the corpus-scan hot path; this expression emits one static
  * call per row inside the generated loop (same pattern as
  * [[CharNGrams]]). The fast path is free: `Normalizer.isNormalized`
  * is O(n) scan-and-bail for already-NFC ASCII/Latin text — the
  * overwhelming majority of a real corpus — and returns the INPUT
  * UTF8String without copying.
  *
  * Oracle mirror: DuckDB `nfc_normalize(text)` (utf8proc). Both
  * implement Unicode canonical composition, which the standard pins
  * exactly — byte-identical outputs by construction.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNorm.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeNorm {
  /** NFC-normalize; returns the input object untouched when already
    * normalized (isNormalized is scan-and-bail, so the common
    * already-NFC row pays one decode but no normalize + re-encode).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object UnicodeFunctions {
  /** Column wrapper: NFC canonical composition. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
