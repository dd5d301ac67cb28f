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

  /** Repair [[replaceDir]]'s crash window for a whole index root: a
    * crash between the two renames leaves `dest` MISSING with the only
    * copy parked at `dest.old`. An aside with no live sibling renames
    * back (it IS the index); one with a live sibling is the stale
    * pre-swap copy of a completed swap and is dropped. Callers that
    * read or append a swappable root should invoke this first (the
    * bucket-level twin lives in `graft.streaming.ScdStreams`). */
  def recoverAside(spark: SparkSession, dest: String): Unit = {
    val destP = new Path(dest)
    val oldP = new Path(dest + ".old")
    val fs = destP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(oldP)) {
      if (!fs.exists(destP)) {
        if (!fs.rename(oldP, destP))
          throw new java.io.IOException(
            s"aside recovery failed: $oldP -> $destP")
      } else fs.delete(oldP, true)
    }
  }

  /** Replace `dest` with the fully-written directory at `tmp` — the
    * commit step of an epoch compaction. The swap renames the live
    * tree ASIDE (`dest.old`) before renaming `tmp` into place, so a
    * failed second rename (cross-filesystem tmp, an object store with
    * no native rename) leaves a recoverable tree: the live index is
    * restored from `dest.old` and the compacted data stays intact in
    * `tmp`. Rename is atomic on HDFS/local and copy-free; the
    * aside→rename window is the same non-atomic reader-visibility gap
    * every hive-layout overwrite has, so compaction should run from
    * the maintenance role that owns the index, not concurrently with
    * readers of the same path. */
  def replaceDir(spark: SparkSession, tmp: String, dest: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpP = new Path(tmp)
    val destP = new Path(dest)
    val oldP = new Path(dest + ".old")
    val fs = destP.getFileSystem(conf)
    require(fs.exists(tmpP), s"compacted dir missing: $tmp")
    fs.delete(oldP, true) // leftover aside from a crashed earlier swap
    val hadDest = fs.exists(destP)
    if (hadDest && !fs.rename(destP, oldP))
      throw new java.io.IOException(s"rename $dest -> $oldP failed")
    if (!fs.rename(tmpP, destP)) {
      // roll back: put the live tree back before surfacing the failure
      if (hadDest) fs.rename(oldP, destP)
      throw new java.io.IOException(
        s"rename $tmp -> $dest failed; live index restored, compacted " +
          s"data left in $tmp")
    }
    if (hadDest) fs.delete(oldP, true)
  }
}
