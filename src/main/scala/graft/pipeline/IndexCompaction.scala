package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Batch-directory compaction shared by the incremental indexes
  * ([[Similarity.writeIvfIndex]]'s `batch=/__cell=` layout and
  * [[Dedup.writeLshIndex]]'s `bands`/`shingles` pair).
  *
  * Incremental appends are the right daily shape — per-batch cost
  * scales with the batch, not the corpus — but each append adds a
  * `batch=` subdir: after N batches every reader lists N directories
  * and each cell's rows are spread over up to N small files, the
  * listing + small-file tax that dominates scan planning on an
  * object store. Compaction folds them back to ONE batch with
  * unchanged row content by default: it changes file layout, never
  * answers. The `fold` hook lets a caller whose readers RE-AGGREGATE
  * the table anyway (the MV partial layout —
  * [[graft.streaming.StreamingMvMaintenance.compact]]) pre-fold rows
  * during the rewrite; the hook owns the answer-preservation
  * argument.
  */
private[graft] object IndexCompaction {

  /** Rewrite all `batch=` subdirs of `tablePath` as a single
    * `batch=<intoBatchId>`, preserving `partitionCols`
    * subpartitioning, via write-aside + whole-directory swap (the
    * [[graft.Pipeline]] overwrite discipline): the merged batch is
    * fully materialized into a dot-prefixed SIBLING directory —
    * invisible to Spark's file listing, so a crashed run can never
    * pollute an index read — then live -> old, side -> live, old
    * deleted. A crash before the first rename leaves the live index
    * untouched; a crash between the renames leaves NO live directory,
    * so readers fail loudly instead of silently serving half an index
    * (re-run the compaction to restore). Idempotent — re-running on a
    * compacted table rewrites its single batch to itself.
    *
    * Returns the number of batch subdirs merged (0 = table absent or
    * batch-less: nothing to do, nothing touched).
    *
    * `exclude` (idCol, ids frame) physically drops rows whose idCol
    * value appears in the frame — how the index TOMBSTONE sets
    * ([[Dedup.tombstoneLshIndex]], [[Similarity.tombstoneIvfIndex]])
    * are applied: readers anti-join tombstones on every query, so
    * folding the deletion into the compaction rewrite the index pays
    * for anyway makes the dead rows free to drop. The anti-join
    * carries only the id column of the removed set against the table
    * being rewritten (AQE broadcasts the typical small daily set).
    */
  def compact(spark: SparkSession, tablePath: String, intoBatchId: String,
      partitionCols: Seq[String],
      exclude: Option[(String, org.apache.spark.sql.DataFrame)] = None,
      fold: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        identity): Int = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(tablePath)
    val fs = live.getFileSystem(hconf)
    if (!fs.exists(live)) return 0
    val batches = fs.listStatus(live).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (batches.isEmpty) return 0
    val parent = live.getParent
    val tmp = new org.apache.hadoop.fs.Path(parent, s".${live.getName}.compact_tmp")
    val old = new org.apache.hadoop.fs.Path(parent, s".${live.getName}.compact_old")
    Seq(tmp, old).foreach(p => if (fs.exists(p)) fs.delete(p, true))
    val raw = spark.read.parquet(tablePath).drop("batch")
    val df = exclude.fold(raw) { case (idCol, ids) =>
      raw.join(ids.select(org.apache.spark.sql.functions.col(idCol)).distinct(),
        Seq(idCol), "left_anti")
    }
    val writer = fold(df).write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(s"$tmp/batch=$intoBatchId")
    // the write above fully materialized the merged batch — the lazy
    // read of the live files is spent, so the swap is safe
    fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, true)
    batches.size
  }
}
