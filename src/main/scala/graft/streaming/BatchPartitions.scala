package graft.streaming

import org.apache.spark.sql.SparkSession

/** `batch=<id>` partition discovery for the replay-idempotent ingest
  * operators, via the Hadoop FileSystem API — so the state/index
  * paths work on any Hadoop-supported filesystem (HDFS, S3A, local),
  * not just local disk. Driver-side metadata only: one directory
  * listing, O(committed batches).
  */
private[streaming] object BatchPartitions {

  /** Ids of committed `batch=` partitions under `path`, strictly
    * below `beforeBatch` (replay isolation: a re-run of batch N must
    * only see state committed by batches < N). Missing root (first
    * batch, fresh run) is empty, not an error.
    */
  def priorIds(spark: SparkSession, path: String, beforeBatch: Long): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .filter(_ < beforeBatch)
  }
}
