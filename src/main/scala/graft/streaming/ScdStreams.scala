package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.etl.Scd

/** Streaming SCD2 maintenance (round-11): a live dimension table whose
  * history folds forward one micro-batch at a time — the streaming
  * twin of [[graft.etl.Scd.scd2Apply]], persisted the way the other
  * long-lived artifacts here are (dedup/ANN/phash indexes):
  *
  *  - the history lives as parquet HIVE-PARTITIONED by a key-hash
  *    bucket (`bucket=N`), so a batch touches only the buckets its
  *    keys hash into: the read is partition-pruned to touched buckets
  *    and the write is a dynamic-partition overwrite of exactly those
  *    buckets — per-batch cost ∝ batch + touched buckets, never the
  *    history's size;
  *  - exactly-once across at-least-once replays comes from TWO layers:
  *    a per-batch marker (`_applied/batch=<id>` — replayed batches
  *    whose marker survives are skipped outright) and
  *    `scd2Apply(onLateDrop = true)` underneath it, which makes
  *    re-applying already-applied observations a no-op even when the
  *    crash window ate the marker (observations at or before a key's
  *    current `effective_from` are late by definition — the watermark
  *    posture);
  *  - micro-batches are serial (Structured Streaming's contract), so
  *    the read-modify-write on the bucket partitions is race-free.
  */
object ScdStreams {

  def bucketOf(keyCol: Column, buckets: Int): Column =
    pmod(xxhash64(keyCol), lit(buckets.toLong))

  /** Materialize an initial SCD2 history (the [[Scd.scd2FromEvents]]
    * output shape) bucketed by key hash. The bucket count is recorded
    * in the layout (`_meta/buckets=N`) so a later ingest with a
    * mismatched count fails loudly instead of silently hashing keys
    * into the wrong partitions. */
  def writeScdHistory(
      history: DataFrame, path: String, keyCol: String,
      buckets: Int = 16): Unit = {
    history.withColumn("bucket", bucketOf(col(keyCol), buckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    val fs = new Path(path)
      .getFileSystem(history.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$path/_meta/buckets=$buckets"))
  }

  /** The layout's recorded bucket count (None on a pre-meta layout). */
  def readScdBuckets(spark: SparkSession, path: String): Option[Int] = {
    val meta = new Path(s"$path/_meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) None
    else fs.listStatus(meta).map(_.getPath.getName)
      .collectFirst { case s if s.startsWith("buckets=") =>
        s.stripPrefix("buckets=").toInt }
  }

  /** The full history, bucket column dropped. Recovers any crashed
    * mid-swap bucket first ([[recoverAsides]]) — a reader that raced a
    * crash must never observe a bucket's history as empty while its
    * only copy sits in the `.old` aside. */
  def readScdHistory(spark: SparkSession, path: String): DataFrame = {
    recoverAsides(spark, path)
    spark.read.parquet(path).drop("bucket")
  }

  /** Repair the crash window INSIDE [[graft.io.Fs.replaceDir]]'s
    * two-rename swap: a crash after `bucket=N` → `bucket=N.old` but
    * before the staged dir renamed in leaves the bucket MISSING from
    * the live tree with the `.old` aside holding the ONLY copy of its
    * history. Without repair the replay would read empty history for
    * that bucket, rebuild it from the batch alone, and replaceDir's
    * initial aside-delete would destroy the prior rows — silent
    * permanent loss of the bucket's untouched-key versions. So, before
    * any read or apply: an aside with NO live sibling renames back
    * (the swap never completed — the aside IS the bucket); an aside
    * WITH a live sibling is the stale pre-swap copy of a swap that DID
    * complete but crashed before its cleanup delete — dropped. One
    * `listStatus` of the root; micro-batches are serial, so the repair
    * never races an in-flight swap. */
  private[graft] def recoverAsides(spark: SparkSession, path: String): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // root-level aside first — [[rebucketScdHistory]] swaps the WHOLE
    // tree through Fs.replaceDir, whose crash window parks it at
    // `$path.old` with the live root missing; same repair rule
    val rootAside = new Path(path + ".old")
    if (fs.exists(rootAside)) {
      if (!fs.exists(root)) {
        if (!fs.rename(rootAside, root))
          throw new java.io.IOException(
            s"root aside recovery failed: $rootAside -> $root")
      } else fs.delete(rootAside, true)
    }
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("bucket=") && name.endsWith(".old")) {
        val live = new Path(root, name.dropRight(".old".length))
        if (!fs.exists(live)) {
          if (!fs.rename(st.getPath, live))
            throw new java.io.IOException(
              s"aside recovery failed: ${st.getPath} -> $live")
        } else fs.delete(st.getPath, true)
      }
    }
  }

  private def markerPath(path: String, batchId: Long) =
    new Path(s"$path/_applied/batch=$batchId")

  /** The compacted-marker watermark: every batch id ≤ it is applied.
    * −1 when no `upto=` marker exists (nothing compacted yet). */
  private def markerWatermark(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Long = {
    val dir = new Path(s"$path/_applied")
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("upto=") =>
        s.stripPrefix("upto=").toLong }
      .foldLeft(-1L)(math.max)
  }

  private def batchApplied(fs: org.apache.hadoop.fs.FileSystem,
      path: String, batchId: Long): Boolean =
    batchId <= markerWatermark(fs, path) ||
      fs.exists(markerPath(path, batchId))

  /** MARKER COMPACTION — the first unbounded-growth sink of a long-run
    * ingest: one `_applied/batch=<id>` dir per micro-batch, forever.
    * Batches apply serially and each marker is written before the next
    * batch starts, so present ids are contiguous above the previous
    * watermark; the compaction folds that contiguous prefix into a
    * single `upto=<w>` dir and deletes the per-batch dirs it covers.
    * Crash-safe by ordering: the new watermark is committed (one
    * mkdirs) BEFORE any delete, so a crash mid-cleanup only leaves
    * redundant markers — [[batchApplied]] honours whichever survives.
    * Defensive: a gap above the watermark (impossible under the serial
    * contract, conceivable after manual surgery) stops the fold at the
    * gap, never marking an unapplied batch as applied. */
  def compactScdMarkers(spark: SparkSession, path: String): Unit = {
    val dir = new Path(s"$path/_applied")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val names = fs.listStatus(dir).map(_.getPath.getName)
    val prior = names.collect { case s if s.startsWith("upto=") =>
      s.stripPrefix("upto=").toLong }.foldLeft(-1L)(math.max)
    val ids = names.collect { case s if s.startsWith("batch=") =>
      s.stripPrefix("batch=").toLong }.sorted
    var w = prior
    ids.foreach { id => if (id <= w + 1) w = math.max(w, id) }
    if (w > prior) fs.mkdirs(new Path(s"$path/_applied/upto=$w"))
    ids.filter(_ <= w).foreach(id => fs.delete(markerPath(path, id), true))
    names.collect { case s if s.startsWith("upto=") =>
      s.stripPrefix("upto=").toLong }.filter(_ < w)
      .foreach(v => fs.delete(new Path(s"$path/_applied/upto=$v"), true))
  }

  /** Fold one observation batch into the persisted history. Visible
    * for the batch-twin parity tests; the streaming ingest calls it
    * per micro-batch. */
  private[graft] def applyScdBatch(
      batch: DataFrame, path: String, keyCol: String, orderCol: String,
      tracked: Seq[String], tieCols: Seq[String], buckets: Int,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAsides(spark, path) // crashed mid-swap bucket from any prior batch
    readScdBuckets(spark, path).foreach(n => require(n == buckets,
      s"bucket-count mismatch: layout at $path has $n buckets, caller " +
        s"passed $buckets (did a rebucketScdHistory run in between?)"))
    if (batchApplied(fs, path, batchId)) return // replayed batch
    val touched = batch.select(bucketOf(col(keyCol), buckets).as("b"))
      .distinct().collect().map(_.getLong(0)) // ≤ `buckets` rows
    // partition-pruned: only the touched bucket directories are read
    val hist = spark.read.parquet(path)
      .filter(col("bucket").isin(touched.map(Long.box): _*))
      .drop("bucket")
    val updated = Scd.scd2Apply(hist, batch, keyCol, orderCol, tracked,
      tieCols, onLateDrop = true)
      .withColumn("bucket", bucketOf(col(keyCol), buckets))
    // Crash-safe commit: the touched buckets are FULLY REWRITTEN into a
    // sibling scratch dir first, then swapped in one atomic rename per
    // bucket (the MatView.compact / Orchestrator posture). A crash
    // before any rename leaves the prior history untouched; a crash
    // between a bucket's two renames parks its only copy in the `.old`
    // aside, which [[recoverAsides]] renames back before the replay
    // reads; with that repair every bucket the replay sees is either
    // old-complete or new-complete, and the missing marker makes the
    // replay re-apply the batch — a no-op on already-swapped buckets
    // thanks to onLateDrop, a completion on the rest. The earlier
    // dynamic-partition overwrite wrote the live path in place, so a
    // crash inside ITS commit window could lose untouched-key history.
    val scratch = s"$path.staging_batch_$batchId"
    graft.io.Fs.deleteRecursive(spark, scratch) // crashed earlier try
    updated.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(scratch)
    touched.foreach { b =>
      val tmpBucket = new Path(s"$scratch/bucket=$b")
      // absent only when the bucket had no history AND the whole batch
      // for it was late-dropped — nothing to commit then
      if (fs.exists(tmpBucket))
        graft.io.Fs.replaceDir(spark, tmpBucket.toString, s"$path/bucket=$b")
    }
    graft.io.Fs.deleteRecursive(spark, scratch) // _SUCCESS + empty shell
    fs.mkdirs(markerPath(path, batchId))
  }

  private def archivePath(path: String) = s"$path.archive"

  /** HISTORY ARCHIVAL — the second unbounded-growth sink: every touched
    * bucket is fully rewritten per batch, so per-batch rewrite cost
    * grows with the bucket's closed-version count forever. Closed rows
    * are immutable ([[Scd.scd2Apply]] passes them through untouched and
    * only needs each key's CURRENT row to fold a batch), so rows with
    * `effective_to <= before` move to an append-only sibling tree
    * (`$path.archive/epoch=N` — a sibling, not a child, so
    * [[rebucketScdHistory]]'s root swap never has to carry it) and the
    * live buckets rewrite without them. Current rows never archive and
    * keys are never deleted, so every bucket keeps at least its current
    * rows and the apply path is unchanged.
    *
    * Crash story: the epoch commits by rename (write to a `.staging`
    * dir, rename to `epoch=N`), archive-then-shrink ordering means a
    * crash between the two duplicates rows in live+archive rather than
    * losing them; the next run's anti-join (below) and
    * [[readScdHistoryFull]]'s (key, version) dedup both absorb the
    * duplicates. Re-running after any crash completes the shrink. */
  def archiveScdHistory(spark: SparkSession, path: String, keyCol: String,
      before: Column): Unit = {
    recoverAsides(spark, path)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = readScdBuckets(spark, path).getOrElse(
      throw new IllegalStateException(s"no _meta/buckets marker at $path"))
    val hist = spark.read.parquet(path)
    val cold0 = hist.filter(!col("is_current") && col("effective_to") <= before)
    // idempotence across crashed retries: rows already archived (same
    // key + version — the history's unique id) are not archived again
    val arch = new Path(archivePath(path))
    val cold =
      if (!fs.exists(arch) || fs.listStatus(arch).isEmpty) cold0
      else cold0.join(
        spark.read.parquet(archivePath(path))
          .select(col(keyCol), col("version")),
        Seq(keyCol, "version"), "left_anti")
    if (cold.isEmpty) return
    val epoch = if (!fs.exists(arch)) 0L
      else fs.listStatus(arch).map(_.getPath.getName)
        .collect { case s if s.startsWith("epoch=") =>
          s.stripPrefix("epoch=").toLong }.foldLeft(-1L)(math.max) + 1L
    val staging = s"${archivePath(path)}/.epoch_staging"
    graft.io.Fs.deleteRecursive(spark, staging)
    cold.drop("bucket").write.parquet(staging)
    if (!fs.rename(new Path(staging), new Path(s"${archivePath(path)}/epoch=$epoch")))
      throw new java.io.IOException(s"archive epoch commit failed at $path")
    // shrink the live buckets: scratch + per-bucket swap, exactly the
    // applyScdBatch commit shape (recoverAsides repairs its windows)
    val keep = hist.filter(col("is_current") || col("effective_to") > before)
    val scratch = s"$path.staging_archive"
    graft.io.Fs.deleteRecursive(spark, scratch)
    keep.repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(scratch)
    (0 until buckets).foreach { b =>
      val tmpBucket = new Path(s"$scratch/bucket=$b")
      if (fs.exists(tmpBucket))
        graft.io.Fs.replaceDir(spark, tmpBucket.toString, s"$path/bucket=$b")
    }
    graft.io.Fs.deleteRecursive(spark, scratch)
  }

  /** Live history ∪ archived epochs, deduplicated on the history's
    * unique (key, version) id — exact even if a crashed archival run
    * left rows in both trees. Use [[readScdHistory]] when archived
    * depth isn't needed; this one pays a dedup shuffle. */
  def readScdHistoryFull(spark: SparkSession, path: String,
      keyCol: String): DataFrame = {
    val live = readScdHistory(spark, path)
    val arch = new Path(archivePath(path))
    val fs = arch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(arch) || fs.listStatus(arch).isEmpty) live
    else live.unionByName(
        spark.read.parquet(archivePath(path)).select(live.columns.map(col): _*))
      .dropDuplicates(keyCol, "version")
  }

  /** RE-BUCKETING — the growth path when buckets outgrow their batch
    * budget: rewrite the whole live tree under a new bucket count and
    * swap it in atomically at the ROOT (one [[graft.io.Fs.replaceDir]]
    * — a mixed-generation tree must never be visible, because touched-
    * bucket pruning under the new count would miss keys still sitting
    * in old-basis buckets). Markers and meta are empty dirs, recreated
    * inside the staging tree before the swap (compacted first, so
    * that's two mkdirs, not thousands); the archive is a sibling and
    * never moves. Run from the maintenance role with the ingest
    * stopped; a crash inside the swap parks the old tree at
    * `$path.old`, which [[recoverAsides]] restores. */
  def rebucketScdHistory(spark: SparkSession, path: String, keyCol: String,
      newBuckets: Int): Unit = {
    recoverAsides(spark, path)
    compactScdMarkers(spark, path)
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = s"$path.rebucket_staging"
    graft.io.Fs.deleteRecursive(spark, staging)
    spark.read.parquet(path).drop("bucket")
      .withColumn("bucket", bucketOf(col(keyCol), newBuckets))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(staging)
    val applied = new Path(s"$path/_applied")
    if (fs.exists(applied))
      fs.listStatus(applied).foreach(st =>
        fs.mkdirs(new Path(s"$staging/_applied/${st.getPath.getName}")))
    fs.mkdirs(new Path(s"$staging/_meta/buckets=$newBuckets"))
    graft.io.Fs.replaceDir(spark, staging, path)
  }

  /** Streaming ingest: each micro-batch of keyed observations folds
    * into the persisted history. The caller owns checkpointing via
    * `writeStream` options upstream. */
  def scdIngest(
      observations: DataFrame, path: String, checkpointDir: String,
      keyCol: String, orderCol: String, tracked: Seq[String],
      tieCols: Seq[String] = Nil, buckets: Int = 16): StreamingQuery =
    observations.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyScdBatch(batch, path, keyCol, orderCol, tracked, tieCols,
          buckets, batchId)
      }
      .start()
}
