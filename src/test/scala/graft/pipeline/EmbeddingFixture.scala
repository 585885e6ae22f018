package graft.pipeline

/** Shared deterministic clustered-embedding fixture generator for the
  * ANN specs (RecallGateSpec, IvfIndexSpec): md5-folded pseudo-random
  * components — the same no-RNG device as [[Similarity.plane]] — so
  * every corpus is identical across runs, partitionings and JVMs.
  * Specs pick their own seed prefixes, dimensionality and jitter;
  * this object owns the fold so the two corpora can't silently
  * diverge.
  */
object EmbeddingFixture {

  /** Component i of a unit-scale pseudo-random vector for seed s:
    * first md5 byte of "s:i" mapped affinely onto [-1, 1].
    */
  def rnd(s: String, i: Int): Float = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$s:$i".getBytes("UTF-8"))
    ((h(0) & 0xFF) / 127.5f) - 1.0f
  }

  /** Cluster center c: a fresh md5-random direction per (prefix, c). */
  def center(prefix: String, dim: Int)(c: Int): Array[Float] =
    Array.tabulate(dim)(i => rnd(s"${prefix}c:$c", i))

  /** Member m of cluster c: the center plus `jitter`-scaled
    * md5-random noise — tight clusters for small jitter, so a
    * cluster's members share buckets/cells and the query's true
    * top-k are its cluster-mates.
    */
  def member(prefix: String, dim: Int, jitter: Float)(c: Int, m: Int): Array[Float] = {
    val ctr = center(prefix, dim)(c)
    Array.tabulate(dim)(i => ctr(i) + jitter * rnd(s"${prefix}m:$c:$m", i))
  }
}
