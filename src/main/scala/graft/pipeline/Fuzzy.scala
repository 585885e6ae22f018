package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string matching for entity resolution / vocabulary
  * reconciliation: the q-gram-blocked edit-distance join (the ed-join
  * family: Xiao et al., "Ed-Join", VLDB 2008) — find all pairs of
  * strings within Levenshtein distance `maxDist` without an all-pairs
  * comparison.
  *
  * Plan shape (the [[Dedup.jaccardPairs]] inverted-index discipline):
  * distinct strings -> codegen'd char q-grams
  * ([[graft.functions.NGramFunctions.charNGrams]]) -> df-capped
  * inverted index -> candidate pairs share at least one kept gram and
  * pass the length filter (|len(a) - len(b)| <= maxDist, an exact
  * necessary condition) -> exact `levenshtein` verify. Work is
  * candidate-grain, bounded by the gram cap — never C(n, 2) over the
  * vocabulary.
  *
  * Blocking contract (documented recall, the p08 banding precedent):
  * a pair within `maxDist` edits shares at least
  * `max(len) + 1 - q - maxDist * q` q-grams, so blocking is COMPLETE
  * for strings of length >= (maxDist + 1) * q; shorter strings can
  * disagree on every gram (e.g. "ab"/"ba" at q = 2) and such pairs
  * are best-effort. Strings shorter than q yield no grams and never
  * pair. Grams appearing in more than `maxGramDf` strings are
  * excluded from blocking (a flood gram like "th" would otherwise
  * quadratically pair half the vocabulary); pairs whose EVERY shared
  * gram is flooded are missed — raise the cap or lower q to trade
  * cost for recall.
  */
object Fuzzy {

  /** All distinct (str_a < str_b) pairs of `strCol` values within
    * `maxDist` edits, with the distance. Input rows are deduplicated
    * on the string — callers join the verdict back to their id grain.
    */
  def fuzzyPairs(strs: DataFrame, strCol: String, maxDist: Int = 2,
      q: Int = 2, maxGramDf: Int = 10000): DataFrame = {
    val s = strs.select(col(strCol).cast("string").as("__s"))
      .where(col("__s").isNotNull).distinct()
    val grams = s.select(col("__s"),
      explode(graft.functions.NGramFunctions.charNGrams(col("__s"), q))
        .as("__g"))
      .distinct()
    val keep = grams.groupBy("__g").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxGramDf).select("__g")
    val capped = grams.join(keep, Seq("__g"), "left_semi")
    capped.select(col("__g"), col("__s").as("str_a"))
      .join(capped.select(col("__g"), col("__s").as("str_b")), Seq("__g"))
      .where(col("str_a") < col("str_b"))
      .where(abs(length(col("str_a")) - length(col("str_b"))) <= maxDist)
      .select("str_a", "str_b").distinct()
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")).cast("long"))
      .where(col("dist") <= maxDist)
  }

  /** The grams [[fuzzyPairs]] excluded from blocking under the same
    * parameters — (gram, n_strings) above the cap (the
    * [[Similarity.overflowBuckets]] observability contract).
    */
  def overflowGrams(strs: DataFrame, strCol: String, q: Int = 2,
      maxGramDf: Int = 10000): DataFrame = {
    val s = strs.select(col(strCol).cast("string").as("__s"))
      .where(col("__s").isNotNull).distinct()
    s.select(col("__s"),
      explode(graft.functions.NGramFunctions.charNGrams(col("__s"), q))
        .as("gram"))
      .distinct()
      .groupBy("gram").agg(count(lit(1)).as("n_strings"))
      .where(col("n_strings") > maxGramDf)
  }
}
