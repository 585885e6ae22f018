package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.TextAnalysis

class RollingHashSpec extends SparkSpec {

  import spark.implicits._

  /** Direct per-window polynomial — the definition the O(n) rolling
    * form must reproduce bit-for-bit (and what the DuckDB oracle
    * computes).
    */
  private def direct(text: String, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    if (cps.length < w) Seq.empty
    else (0 to cps.length - w).map { i =>
      (i until i + w).foldLeft(0L)((h, j) =>
        (h * RollingHash.Base + cps(j)) % RollingHash.Mod)
    }
  }

  test("rolling form equals the direct polynomial, incl. multibyte code points") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcdefgh", // exactly one window at w=8
      "short", // < w: no windows
      "", // empty
      "naïve café — überstraße 日本語テキスト mixed in") // multibyte
    for (t <- texts; w <- Seq(1, 4, 8)) {
      val got = Seq(t).toDF("text")
        .select(RollingHashFunctions.rollingHashes(col("text"), w).as("hs"))
        .head().getSeq[Long](0)
      assert(got === direct(t, w), s"w=$w text='$t'")
    }
  }

  test("winnowedFingerprints: edit locality and short-doc safety") {
    val base = "0123456789" * 10 // 100 chars
    val edited = base.updated(50, 'X').toString
    val df = Seq((1L, base), (2L, edited), (3L, "tiny")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowedFingerprints(df, window = 8, band = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // a 1-char edit leaves fingerprints outside its windows intact:
    // the two docs still share most of the fingerprint set
    val shared = fps(1L).intersect(fps(2L))
    assert(shared.nonEmpty)
    assert(shared.size * 2 > fps(1L).size, s"shared=${shared.size} of ${fps(1L).size}")
    // ...but not ALL: the edit must change something
    assert(fps(1L) !== fps(2L))
    // docs shorter than the window yield no fingerprints (no crash)
    assert(!fps.contains(3L))
  }

  test("whole-stage codegen path and interpreted path agree") {
    val df = Seq("the quick brown fox").toDF("text")
    val viaPlan = df
      .select(RollingHashFunctions.rollingHashes(col("text"), 8).as("hs"))
      .head().getSeq[Long](0)
    val viaEval = RollingHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox"), 8)
      .toLongArray().toSeq
    assert(viaPlan === viaEval)
  }
}
