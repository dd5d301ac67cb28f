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
    * output shape) bucketed by key hash. */
  def writeScdHistory(
      history: DataFrame, path: String, keyCol: String,
      buckets: Int = 16): Unit =
    history.withColumn("bucket", bucketOf(col(keyCol), buckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** The full history, bucket column dropped. */
  def readScdHistory(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("bucket")

  private def markerPath(path: String, batchId: Long) =
    new Path(s"$path/_applied/batch=$batchId")

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
    if (fs.exists(markerPath(path, batchId))) return // replayed batch
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
    // between renames leaves every bucket either old-complete or
    // new-complete, and the missing marker makes the replay re-apply
    // the batch — a no-op on already-swapped buckets thanks to
    // onLateDrop, a completion on the rest. The earlier
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
