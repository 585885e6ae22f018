package graft.pipeline

import org.apache.spark.sql.Row

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  test("line stats count duplicate lines and their characters") {
    val df = Seq(
      (1L, "aaa\nbbb\naaa\nccc\naaa"), // aaa x3 (dup), bbb, ccc
      (2L, "xx\nyy"),                  // no dups
      (3L, "")                          // no lines
    ).toDF("doc_id", "text")
    val m = Repetition.lineStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_lines") === 5L)
    assert(r1.getAs[Long]("n_dup_lines") === 3L)      // all 3 aaa occurrences
    assert(r1.getAs[Long]("line_chars") === 15L)      // 5 lines x 3 chars
    assert(r1.getAs[Long]("dup_line_chars") === 9L)   // 3 x "aaa"
    val r2 = m(2L)
    assert(r2.getAs[Long]("n_dup_lines") === 0L)
    assert(!m.contains(3L)) // empty text yields no line rows
  }

  test("top n-gram picks highest count, ties to lexicographically smallest") {
    // "b a b a" -> bigrams: "b a" x2? tokens b,a,b,a -> "b a","a b","b a"
    val df = Seq((1L, "b a b a"), (2L, "z q z q z")).toDF("doc_id", "text")
    val m = Repetition.topNGram(df, 2).collect()
      .map(r => (r.getLong(0), (r.getAs[Long]("top_cnt"), r.getAs[String]("top_gram")))).toMap
    assert(m(1L) === ((2L, "b a")))
    // doc 2: "z q" x2, "q z" x2 — tie, smallest gram wins
    assert(m(2L) === ((2L, "q z")))
  }

  test("signals assemble fractions with exact integer ratios and clamp") {
    val df = Seq(
      (1L, "aaa\naaa\nbb"),   // 3 lines, 2 dup; chars 3+3+2=8, dup 6
      (2L, "solo line only"),
      (3L, "")
    ).toDF("doc_id", "text")
    val rows = Repetition.signals(df, topNs = Seq(2), dupNs = Seq(2)).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getAs[Double]("dup_line_fraction") === 2.0 / 3.0)
    assert(r1.getAs[Double]("dup_line_char_fraction") === 6.0 / 8.0)
    // tokens of doc1: aaa aaa bb -> bigrams "aaa aaa", "aaa bb"; top cnt 1
    // n_chars = length("aaa\naaa\nbb") = 10; top_chars = 7
    assert(r1.getAs[Double]("top2gram_char_fraction") === 7.0 / 10.0)
    assert(r1.getAs[Double]("dup2gram_char_fraction") === 0.0)
    val r3 = rows(3L)
    assert(r3.getAs[Long]("n_lines") === 0L)
    assert(r3.getAs[Double]("dup_line_fraction") === 0.0)
    assert(r3.getAs[Double]("top2gram_char_fraction") === 0.0)
  }

  test("dup n-gram char fraction clamps at 1 on pathological repetition") {
    val df = Seq((1L, ("ha " * 50).trim)).toDF("doc_id", "text")
    val r = Repetition.signals(df, topNs = Seq(2), dupNs = Seq(2))
      .collect().head
    // 49 overlapping "ha ha" bigrams, each 5 chars, text 149 chars:
    // raw ratio 49*5/149 > 1 -> clamped
    assert(r.getAs[Double]("dup2gram_char_fraction") === 1.0)
  }
}
