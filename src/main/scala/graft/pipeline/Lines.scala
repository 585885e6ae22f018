package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level exact LINE dedup — the RefinedWeb/C4-family pass that
  * removes boilerplate lines (nav menus, cookie banners, footers)
  * repeated verbatim across documents while each document keeps its
  * one "first" copy: an occurrence of a line survives iff it is the
  * corpus-wide FIRST occurrence of that line (minimal (doc_id, pos)),
  * or the line is whitespace-only (layout, not content — blank lines
  * never count as duplicates and never consume a winner slot).
  *
  * Scale shape: the dedup decision never shuffles text. Occurrences
  * are reduced to (doc_id, pos, h) with h a 60-bit md5 of the raw
  * line; the winner per h is a map-side-combinable min over a
  * (doc_id, pos) struct — lexicographic, correct for the FULL long
  * id domain (the earlier packed doc_id * 2^32 + pos BIGINT silently
  * overflowed for ids >= 2^31, a real hazard with the 60-bit
  * hash-derived ids used elsewhere in this repo), so a line repeated
  * a million times costs one counter row, and the only corpus-sized shuffle
  * carrying text is the final doc-keyed join that rebuilds
  * clean_text (the same reconstruction floor as
  * [[Spans.removeDuplicatedSpans]]). A hot line's h is a skewed join
  * key on the verdict join — AQE skew-split applies; the payload is
  * 3 longs either way.
  *
  * Reference framing: RefinedWeb (Penedo et al. 2023) and the
  * MassiveText pipeline both report exact line-grain dedup as a
  * first-class pass alongside document-level MinHash; C4 does it at
  * the three-sentence grain with the same first-occurrence policy.
  */
object Lines {

  /** Global occurrence order: min over this struct IS lexicographic
    * min over (doc_id, pos), with no domain restriction on either
    * field (same shuffle payload class as a packed long — two
    * fixed-width ints per group — without the 2^31 id overflow).
    */
  private def ord(doc: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column) =
    struct(doc, pos)

  /** One row per (doc_id, pos, line): the exploded line frame.
    * split's -1 limit keeps trailing empty strings, so every '\n'
    * delimits exactly one line on both engines.
    */
  def lineOccurrences(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))

  /** Per-document line-dedup verdict + reconstruction:
    * (doc_id, n_lines, n_kept, clean_text) where clean_text is the
    * document with every non-first duplicate line removed.
    */
  def dedupLines(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val occ = lineOccurrences(df, textCol, idCol)
      .select(col("doc_id"), col("pos"),
        (trim(col("line")) === "").as("blank"),
        graft.functions.Md5Hash.h60(col("line")).as("h"))
    val winners = occ.where(!col("blank"))
      .groupBy("h").agg(min(ord(col("doc_id"), col("pos"))).as("w"))
    val kept = occ.join(winners, Seq("h"), "left")
      .select(col("doc_id"), col("pos"),
        (col("blank") || ord(col("doc_id"), col("pos")) === col("w")).as("keep"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sort_array(collect_list(when(col("keep"), col("pos")))).as("__keep"))
    // the one text-carrying shuffle: docs join their kept-position
    // arrays; clean_text is rebuilt by direct index into the split
    // array (O(kept) element_at lookups, all codegen-friendly array
    // ops — no per-line re-shuffle)
    val ls = split(col(textCol), "\n", -1)
    df.select(col(idCol).as("doc_id"), col(textCol))
      .join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        array_join(transform(col("__keep"), p => element_at(ls, p + 1)), "\n")
          .as("clean_text"))
  }
}
