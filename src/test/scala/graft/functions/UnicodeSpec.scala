package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.TextAnalysis

class UnicodeSpec extends SparkSpec {

  import spark.implicits._

  private val Composed = "caf\u00e9"          // composed U+00E9
  private val Decomposed = "cafe\u0301" // e + combining acute

  test("nfcNormalize composes decomposed sequences; ASCII is identity") {
    val df = Seq(
      (1L, Decomposed),
      (2L, Composed),
      (3L, "plain ascii"),
      (4L, "A\u030Angstro\u0308m")) // A+ring, o+diaeresis, decomposed
      .toDF("id", "s")
    val got = df.select(col("id"), UnicodeFunctions.nfcNormalize(col("s")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === Composed)
    // the two encodings of the same word become EQUAL — the dedup
    // prerequisite the operator exists for
    assert(got(1L) === got(2L))
    assert(got(3L) === "plain ascii")
    assert(got(4L) === "\u00c5ngstr\u00f6m")
    // code-point length shrinks on composition
    val lens = df.select(col("id"),
      length(UnicodeFunctions.nfcNormalize(col("s"))))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lens(1L) === 4 && lens(2L) === 4)
  }

  test("nfcNormalize: null passthrough and SQL registration") {
    val got = Seq((1L, Option.empty[String]), (2L, Some(Decomposed)))
      .toDF("id", "s")
      .select(col("id"), UnicodeFunctions.nfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === None)
    assert(got(2L) === Some(Composed))
    // same SQL name as the DuckDB builtin the oracle mirrors
    val viaSql = spark.sql("SELECT nfc_normalize('cafe\u0301')")
      .collect().head.getString(0)
    assert(viaSql === Composed)
  }

  test("cleanText: NFC, control strip, whitespace collapse, trim in order") {
    val df = Seq(
      (1L, "  ab\u0007   c\t\td  "),     // BEL stripped, runs collapsed
      (2L, Decomposed + "\u0008 x"),      // compose, then strip backspace
      (3L, "line1\nline2\r\nline3"),  // \n \r survive (line grain)
      (4L, "\u0007\u0008"))               // controls-only -> empty
      .toDF("id", "s")
    val got = df.select(col("id"), TextAnalysis.cleanText(col("s")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "ab c d")
    assert(got(2L) === Composed + " x")
    assert(got(3L) === "line1\nline2\r\nline3")
    assert(got(4L) === "")
  }

  test("cleanText: a control between base and mark blocks composition") {
    // NFC runs FIRST, so a mark separated from its base by a control
    // stays decomposed even after the control is stripped; both
    // engines (java.text.Normalizer and utf8proc) agree, which is
    // why the step order is pinned. Here the pair is adjacent, so
    // it composes; the stripped BEL sits BEFORE the base.
    val got = Seq((1L, "\u0007e\u0301")).toDF("id", "s")
      .select(TextAnalysis.cleanText(col("s"))).collect().head.getString(0)
    assert(got === "\u00e9")
  }
}
