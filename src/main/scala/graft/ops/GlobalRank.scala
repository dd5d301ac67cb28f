package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Exact GLOBAL ranking without a single-partition window — the
  * distributed replacement for `row_number().over(Window.orderBy(...))`
  * / `ntile(k).over(Window.orderBy(...))` on corpus-sized frames (the
  * shape [[graft.tools.PlanLint]] rejects: Spark funnels the whole
  * input through one task).
  *
  * Idiom (the classic zipWithIndex decomposition, kept in DataFrame
  * land): range-partition by the order keys so partitions are globally
  * ordered, FREEZE the partitioning (`localCheckpoint` — the offsets
  * below must describe the exact partitions the rank pass reads;
  * re-sampled range bounds between two jobs would skew them), collect
  * the PARTITION-COUNT-sized size census to the driver, and add each
  * partition's cumulative offset to its partition-local `row_number`.
  * Two narrow shuffles + one extra count pass, every stage distributed;
  * driver state is one long per partition.
  *
  * The order must be TOTAL (tie-break to a unique column) — same
  * requirement the single-partition form has for determinism.
  *
  * Bounds: the rank pass reads the partition-local ordinal from
  * `monotonically_increasing_id`'s documented layout (partition id in
  * the upper bits, record number in the lower 33), so a single
  * partition must hold < 2³³ (~8.6 B) rows — at 100 TB that is
  * satisfied by construction (range partitions are sized to executor
  * memory, orders of magnitude below 8 B rows).
  */
object GlobalRank {

  /** Adds `idName` = exact global 1-based rank of each row under
    * `order`. Value-identical to
    * `row_number().over(Window.orderBy(order))`. */
  def withGlobalRowNumber(df: DataFrame, idName: String,
                          order: Seq[Column]): DataFrame =
    indexed(df, idName, order)._1

  /** Adds `tileName` = exact `ntile(tiles)` bucket of each row under
    * `order` (SQL semantics: the first n mod k tiles carry one extra
    * row), computed from the distributed global rank and the
    * driver-known total — no corpus-sized frame ever meets a
    * single-partition window. */
  def withNtile(df: DataFrame, tiles: Int, tileName: String,
                order: Seq[Column]): DataFrame = {
    require(tiles > 0, s"tiles must be positive, got $tiles")
    val (ranked, n) = indexed(df, "__grk_idx", order)
    val base = n / tiles
    val rem = n % tiles
    val cutoff = rem * (base + 1)
    val i0 = col("__grk_idx") - 1L
    val tile = when(i0 < cutoff, i0 / (base + 1) + 1L)
      // greatest(base,1): the else branch is unreachable when base = 0
      // (cutoff = n), but codegen still compiles the division
      .otherwise(lit(rem) + (i0 - cutoff) / math.max(base, 1L) + 1L)
    ranked.withColumn(tileName, tile.cast("int")).drop("__grk_idx")
  }

  private def indexed(df: DataFrame, idName: String,
                      order: Seq[Column]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // range partition + IN-PARTITION sort before the freeze (r15): the
    // checkpointed blocks are globally ordered, so the rank pass needs
    // no further exchange or sort — monotonically_increasing_id's
    // documented layout (partition id in the upper bits, in-partition
    // ordinal in the lower 33) supplies the partition-local row number
    // directly from the frozen iteration order. The old rank pass paid
    // a hash exchange + window sort here.
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .checkpointLinted()
    val sizes = ranged.groupBy(spark_partition_id().as("__grk_pid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + sizes.getOrElse(p, 0L))
    val mid = col("__grk_mid")
    val out = ranged
      .withColumn("__grk_mid", monotonically_increasing_id())
      .withColumn(idName,
        element_at(typedLit(offsets.take(parts)),
          shiftright(mid, 33).cast("int") + 1) +
          mid.bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("__grk_mid")
    (out, offsets.last)
  }
}
