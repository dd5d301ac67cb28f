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
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__grk_pid", spark_partition_id())
      .checkpointLinted()
    val sizes = ranged.groupBy(col("__grk_pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + sizes.getOrElse(p, 0L))
    val w = Window.partitionBy(col("__grk_pid")).orderBy(order: _*)
    val out = ranged
      .withColumn(idName,
        element_at(typedLit(offsets.take(parts)), col("__grk_pid") + 1) +
          row_number().over(w).cast("long"))
      .drop("__grk_pid")
    (out, offsets.last)
  }
}
