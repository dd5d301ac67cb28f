package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Epoch shuffle + sharding — the last step of a training-data
  * pipeline: deal the curated corpus into a fixed number of shards in
  * a deterministic pseudo-random order so training readers stream
  * shards independently with no coordination (public precedent: the
  * sharded-WebDataset / TFRecord layout of large-corpus training
  * runs).
  *
  * Both the shard assignment and the within-shard order are pure
  * functions of the document id via md5 — NOT a physical partition
  * id, a seeded RNG, or a zipWithIndex — so the layout is
  * reproducible across runs, cluster sizes, and engines, and
  * incremental re-shards of an unchanged corpus are byte-stable.
  * Shards are the first `hexChars` hex chars of md5(id) (16^hexChars
  * shards); within a shard, readers order by the REMAINING hex
  * suffix, which is independent of the shard prefix — together they
  * are one global md5 permutation of the corpus, i.e. the epoch
  * shuffle. md5 agrees byte-for-byte between Spark and DuckDB, so
  * the whole layout is ANSI-expressible for the oracle.
  *
  * Scale shape at 100 TB: assignment is a codegen'd projection on the
  * scan (zero shuffle); writing is ONE hash exchange on the shard
  * key — each executor receives only its shards' rows — and the
  * within-shard sort happens inside the write tasks (external,
  * spillable). The manifest is a shard-count-sized partial aggregate.
  */
object Sharding {

  /** Shard key of an id: first `hexChars` chars of md5(id) —
    * 16^hexChars shards, uniform by construction. */
  def shardOf(idCol: Column, hexChars: Int): Column = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars=$hexChars out of range")
    substring(md5(idCol.cast("string")), 1, hexChars)
  }

  /** Within-shard order key: the md5 suffix AFTER the shard prefix
    * (ties impossible at distinct ids broken by the id itself in
    * callers' sorts). */
  def orderOf(idCol: Column, hexChars: Int): Column =
    substring(md5(idCol.cast("string")), hexChars + 1, 32 - hexChars)

  /** Attach (shard, shard_order) to `docs` — a pure projection. */
  def assignShards(docs: DataFrame, idCol: String, hexChars: Int): DataFrame =
    docs
      .withColumn("shard", shardOf(col(idCol), hexChars))
      .withColumn("shard_order", orderOf(col(idCol), hexChars))

  /** Per-shard manifest — the sanity artifact written next to a
    * sharded corpus: row count, payload size, and the id range per
    * shard. One partial-agg exchange of shard-count rows. */
  def manifest(
      docs: DataFrame, idCol: String, sizeCol: String,
      hexChars: Int): DataFrame =
    assignShards(docs, idCol, hexChars)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("long")).as("size_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Write the sharded layout: hive-partitioned by shard, rows
    * within each shard file in epoch-shuffle order. ONE exchange
    * (hash on the shard key), sort inside the write tasks. Readers
    * stream `shard=<h>/` directories independently; a reader of the
    * whole set in (shard, shard_order) order sees the full md5
    * permutation. */
  def writeShards(
      docs: DataFrame, idCol: String, hexChars: Int, path: String): Unit = {
    graft.io.Fs.deleteRecursive(docs.sparkSession, path)
    assignShards(docs, idCol, hexChars)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_order"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
  }

  /** Append one micro-batch to a STREAMED shard layout:
    * `path/batch=<id>/shard=<h>/…`, batch-id-keyed overwrite — the
    * replay-idempotence contract of every streamed artifact here
    * (re-running a batch leaves exactly one copy). Because shard and
    * order are pure functions of the id, the compacted layout is
    * INDEPENDENT of how the stream happened to batch the corpus. */
  def writeShardBatch(
      batch: DataFrame, idCol: String, hexChars: Int, path: String,
      batchId: Long): Unit =
    assignShards(batch, idCol, hexChars)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_order"), col(idCol))
      .write.partitionBy("shard").mode("overwrite")
      .parquet(s"$path/batch=$batchId")

  /** Fold accumulated `batch=<id>` partitions into one `batch=-1`
    * epoch (same contract as the dedup/ANN index compactions): one
    * shuffle of the streamed rows, per-shard file count back to ~1,
    * within-shard epoch order restored globally. Write-then-rename via
    * [[graft.io.Fs.replaceDir]].
    *
    * The read pins partition-column type inference OFF: `shard` values
    * are hex strings, and a small streamed epoch whose observed shards
    * all happen to be numeric (plausible at hexChars ≤ 2) would
    * otherwise be re-inferred as int, making the partitionBy rewrite
    * rename directories (shard=07 → shard=7) and break byte-identity
    * with [[writeShards]]. */
  def compactShards(
      spark: org.apache.spark.sql.SparkSession, idCol: String,
      path: String): Unit = {
    val tmp = s"$path.compact"
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.get(inferKey)
    spark.conf.set(inferKey, "false")
    try {
      spark.read.parquet(path).drop("batch")
        .repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col("shard_order"), col(idCol))
        .write.partitionBy("shard").mode("overwrite").parquet(s"$tmp/batch=-1")
    } finally spark.conf.set(inferKey, prev)
    graft.io.Fs.replaceDir(spark, tmp, path)
  }
}
