package graft.operators

import org.apache.spark.sql.DataFrame

/** The MATERIALIZE half of cache-or-materialize: write a frame to
  * storage and read it back, so every downstream branch re-reads a
  * compact parquet boundary instead of (a) recomputing the upstream
  * chain per branch or (b) pinning a session-scoped cache entry with
  * no unpersist hook. This is the boundary shape a 100 TB run uses —
  * executor caches don't survive job boundaries or autoscaling, a
  * written stage does — and the shape a long-lived multi-tenant
  * session needs (nothing left pinned in the cache manager after the
  * run; cleanup is deleting a directory, not hunting RDD references).
  */
object Materialize {

  /** Write `df` to `path` (parquet, overwrite) and return the
    * read-back frame. The read-back — not `df` — is what downstream
    * stages must consume: its lineage starts at the files, so no
    * branch can re-trigger the upstream computation.
    */
  def boundary(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
