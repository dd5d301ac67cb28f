package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scheme-agnostic filesystem maintenance for persisted index roots.
  *
  * The dedup/ANN/phash indexes are plain parquet layouts that "point at
  * the object store" in a real deployment (s3a://, abfs://, hdfs://…),
  * so any cleanup done with `java.io.File` would silently no-op there
  * and leave stale `batch=<id>` partitions from a dead stream epoch
  * alive in the partitioned read. Routing every recursive delete
  * through the Hadoop [[org.apache.hadoop.fs.FileSystem]] resolved from
  * the path's own scheme makes a corpus-epoch rebuild
  * ([[graft.ops.Dedup.writeDedupIndex]],
  * [[graft.ops.Similarity.writeAnnIndex]],
  * [[graft.ops.Multimodal.writePhashIndex]]) clear siblings correctly
  * on local FS in tests AND on whatever store production mounts. */
object Fs {

  /** Recursively delete `path` if it exists, on whatever filesystem its
    * scheme resolves to. Returns true if something was deleted. */
  def deleteRecursive(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** Replace `dest` with the fully-written directory at `tmp` — the
    * commit step of an epoch compaction: delete the old tree, rename
    * the new one into place. Rename is atomic on HDFS/local and
    * copy-free; the delete→rename window is the same non-atomic gap
    * every hive-layout overwrite has, so compaction should run from
    * the maintenance role that owns the index, not concurrently with
    * readers of the same path. */
  def replaceDir(spark: SparkSession, tmp: String, dest: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpP = new Path(tmp)
    val destP = new Path(dest)
    val fs = destP.getFileSystem(conf)
    require(fs.exists(tmpP), s"compacted dir missing: $tmp")
    fs.delete(destP, true)
    if (!fs.rename(tmpP, destP))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
  }
}
