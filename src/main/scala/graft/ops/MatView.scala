package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.io.Fs
import graft.tools.Ckpt._

/** Incremental materialized-view maintenance (round-11): keep a
  * per-group aggregate table current as batches arrive, WITHOUT
  * rescanning history — the aggregate twin of the SCD2 dimension
  * story ([[graft.etl.Scd]] / [[graft.streaming.ScdStreams]]).
  *
  * The view carries ALGEBRAIC state (n, exact-decimal Σx, min, max):
  * merging states is the same aggregation applied to their union, so
  * folds are associative and commutative — any batch order, any
  * partitioning, any epoch grouping lands on the identical table
  * (asserted in `MatViewSpec`; decimal sums make this exact, where
  * float sums would drift by merge order). Derived measures (avg)
  * compute at read time from the exact state.
  *
  * Persistence is the repo's batch-id-keyed epoch layout (the
  * DocStreams posture, NOT a read-modify-write): each batch writes its
  * OWN group-sized partial to `batch=<id>/` with overwrite, so an
  * at-least-once replay rewrites the identical partial — idempotent by
  * construction, no markers, no crash window. Reading the view is one
  * aggregation over (groups × batches) state rows; [[compact]] folds
  * accumulated partials into a single `batch=-1` epoch via the same
  * rename swap the index compactions use, bounding read cost without
  * changing a single value (fold associativity again).
  *
  * Scale shape: per batch ONE partial-agg exchange over the batch plus
  * a group-cardinality write; the raw stream is never rescanned. */
object MatView {

  /** Aggregate a frame to view state: (k, n, sum_d, mn, mx). */
  def aggregate(df: DataFrame, keyCol: Column, valueCol: Column): DataFrame =
    df.groupBy(keyCol.as("k"))
      .agg(count(lit(1)).as("n"),
        sum(valueCol.cast("decimal(18,2)")).cast("decimal(28,2)").as("sum_d"),
        min(valueCol.cast("decimal(18,2)")).as("mn"),
        max(valueCol.cast("decimal(18,2)")).as("mx"))

  /** Merge view states — the SAME aggregation over the union, so the
    * fold is associative/commutative and engine-exact. */
  def merge(states: DataFrame): DataFrame =
    states.groupBy(col("k"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_d")).cast("decimal(28,2)").as("sum_d"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Write one batch's partial — overwrite on the batch-id dir makes
    * at-least-once replays byte-idempotent. */
  def writePartial(
      batch: DataFrame, path: String, keyCol: Column, valueCol: Column,
      batchId: Long): Unit =
    aggregate(batch, keyCol, valueCol)
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The current view: all persisted partials folded. */
  def readMatView(spark: SparkSession, path: String): DataFrame =
    merge(spark.read.parquet(path).drop("batch"))

  /** Fold accumulated partials into one `batch=-1` epoch (values
    * unchanged — fold associativity), bounding future read cost. */
  def compact(spark: SparkSession, path: String): Unit = {
    val folded = readMatView(spark, path).checkpointLinted()
    val tmp = path + ".next"
    folded.write.mode("overwrite").parquet(s"$tmp/batch=-1")
    Fs.replaceDir(spark, tmp, path)
  }

  /** Streaming maintenance: every micro-batch appends its partial. */
  def matViewIngest(
      observations: DataFrame, path: String, checkpointDir: String,
      keyCol: Column, valueCol: Column): StreamingQuery =
    observations.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writePartial(batch, path, keyCol, valueCol, batchId)
      }
      .start()

  /** Read-time derived measures from the exact state. */
  def withDerived(mv: DataFrame): DataFrame =
    mv.select(col("k"), col("n"),
      Similarity.decToDouble(col("sum_d")).as("total"),
      (Similarity.decToDouble(col("sum_d")) / col("n")).as("mean"),
      Similarity.decToDouble(col("mn")).as("mn"),
      Similarity.decToDouble(col("mx")).as("mx"))
}
