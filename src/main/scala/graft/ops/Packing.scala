package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — the batch-assembly step of a pretraining data
  * pipeline: group variable-length documents into fixed token-budget
  * bins so training batches waste minimal padding (public precedent:
  * example packing in T5 / GPT-NeoX data tooling).
  *
  * Algorithm: deterministic next-fit-decreasing per bucket. Documents
  * are routed to `buckets` independent packing groups by `id mod
  * buckets` (a pure function of the id — NOT a physical partition
  * id), sorted (tokens desc, id asc) within their bucket, and swept
  * once with O(1) state: if the current bin can't fit the next
  * document, a new bin starts. Bin ids are `bucket << 32 | seq`, so
  * the full assignment is reproducible across runs, partitionings,
  * and cluster layouts.
  *
  * Scale shape at 100 TB: ONE hash shuffle of (id, tokens) pairs —
  * 16 bytes/doc, never the document bodies — into `buckets` groups,
  * an external sort within partitions, and a single streaming pass
  * with constant memory per task. `buckets` bounds packing-group
  * size (set it so a bucket's (id, tokens) pairs sort comfortably in
  * one task's spill budget) and is the parallelism knob; bins in
  * different buckets never interact, which costs at most one
  * under-filled bin per bucket vs. a global sweep.
  *
  * Guarantees (checkable invariants, gated by `q_pack_sequences`):
  * every input id appears in exactly one bin; no bin with ≥ 2 docs
  * exceeds `budget`; a doc larger than `budget` sits alone in its
  * bin; and per bucket, next-fit uses at most `max(1,
  * ceil(2·bucket_tokens/budget))` bins (any two consecutive bins sum
  * past the budget), so globally `bins ≤ 2·ceil(total/budget) +
  * 2·buckets`.
  */
object Packing {

  /** Pack `(idCol, tokensCol)` rows into bins of at most `budget`
    * tokens. Returns (idCol, tokensCol, bucket, bin_id); join back on
    * the id to carry payloads. */
  def packNextFit(
      docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, buckets: Int): DataFrame = {
    require(budget >= 1, s"budget=$budget out of range")
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets=$buckets out of range")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    docs
      .select(
        col(idCol).cast("long").as("__pack_id"),
        col(tokensCol).cast("long").as("__pack_tok"),
        pmod(col(idCol).cast("long"), lit(buckets.toLong)).cast("int")
          .as("__pack_bucket"))
      .repartition(math.min(parts, buckets), col("__pack_bucket"))
      .sortWithinPartitions(
        col("__pack_bucket"), col("__pack_tok").desc, col("__pack_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // buckets are contiguous after the sort, so one (bucket, bin,
        // fill) triple is the entire task state
        var curBucket = -1
        var bin = 0L
        var fill = 0L
        it.map { case (id, tok, bucket) =>
          if (bucket != curBucket) { curBucket = bucket; bin = 0L; fill = 0L }
          else if (fill > 0L && fill + tok > budget) { bin += 1L; fill = 0L }
          fill += tok
          (id, tok, bucket, (bucket.toLong << 32) | bin)
        }
      }
      .toDF(idCol, tokensCol, "bucket", "bin_id")
  }

  /** [[packNextFit]] with the document BODIES carried through the
    * sweep — the batch-assembly shape: because the packing bucket is a
    * pure function of the id (`id mod buckets`), the bucket exchange
    * that the sweep needs is the ONLY time the payloads cross the
    * wire; there is no separate skinny-assignment pass to join back
    * (which would cost a second full-body shuffle on the id). Each
    * task sorts its buckets (tokens desc, id asc — external,
    * spillable, the same in-task sort [[Sharding.writeShards]] pays)
    * and streams the next-fit state machine over full rows. Returns
    * `docs`' columns + (bucket, bin_id); bin labels are identical to
    * [[packNextFit]] on the (id, tokens) pairs (asserted bit-for-bit
    * in PackingSpec — same routing, same order, same recurrence).
    * `tokensCol` must already be a long (callers cast once in the
    * projection that computes it). */
  def packDocs(
      docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, buckets: Int): DataFrame = {
    require(budget >= 1, s"budget=$budget out of range")
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets=$buckets out of range")
    require(docs.schema(tokensCol).dataType == LongType,
      s"$tokensCol must be LongType (cast it where it is computed)")
    val spark = docs.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val withBucket = docs.withColumn("bucket",
      pmod(col(idCol).cast("long"), lit(buckets.toLong)).cast("int"))
    val outSchema = withBucket.schema.add("bin_id", LongType, nullable = false)
    val tokIdx = withBucket.schema.fieldIndex(tokensCol)
    val bucketIdx = withBucket.schema.fieldIndex("bucket")
    withBucket
      .repartition(math.min(parts, buckets), col("bucket"))
      .sortWithinPartitions(
        col("bucket"), col(tokensCol).desc, col(idCol))
      .mapPartitions { it =>
        var curBucket = -1
        var bin = 0L
        var fill = 0L
        it.map { r =>
          val bucket = r.getInt(bucketIdx)
          val tok = r.getLong(tokIdx)
          if (bucket != curBucket) { curBucket = bucket; bin = 0L; fill = 0L }
          else if (fill > 0L && fill + tok > budget) { bin += 1L; fill = 0L }
          fill += tok
          Row.fromSeq(r.toSeq :+ ((bucket.toLong << 32) | bin))
        }
      }(Encoders.row(outSchema))
  }

  /** Write the packed-bin layout: [[packDocs]] → hive-partitioned by
    * `bucket`, rows inside each bucket's file in (bin, sweep) order —
    * a training reader streams one bucket file and sees every bin's
    * documents contiguously. The explicit re-sort after the sweep is a
    * cheap near-sorted in-task pass that also hands the writer its
    * required partition-column ordering, so the write adds NO exchange:
    * the bucket repartition inside [[packDocs]] is the single time the
    * corpus moves, and file count = one per bucket per task that owns
    * it (≤ buckets files total when tasks ≥ buckets). */
  def writePackedBins(
      docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, buckets: Int, path: String): Unit = {
    graft.io.Fs.deleteRecursive(docs.sparkSession, path)
    packDocs(docs, idCol, tokensCol, budget, buckets)
      .sortWithinPartitions(col("bucket"), col("bin_id"),
        col(tokensCol).desc, col(idCol))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
  }
}
