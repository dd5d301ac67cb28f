package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension handling: dedup, surrogate ids, FK resolution
  * (SURVEY.md §2 #16, #17, #20).
  *
  * The reference deduplicates the `hoa`/`taxes` dimension frames with
  * whole-row `drop_duplicates` (dags/dag_etl_minio_to_postgres.py:216-219),
  * lets Postgres `SERIAL` assign surrogate ids with a per-row
  * `RETURNING id` read-back captured into a global dict (:125-138), and
  * resolves fact FKs via `Series.map` over that dict (:223-228).
  *
  * Engine shape:
  *   - dedup = `dropDuplicates` (hash aggregate, map-side partial).
  *   - surrogate ids are assigned ENGINE-SIDE, deterministically, before
  *     any write: `row_number().over(Window.orderBy(key))` — no
  *     database read-back, no global mutable state.
  *   - FK resolution is a broadcast equi-join of the (key → id) mapping
  *     to the facts: exactly the semantics of the reference's dict
  *     lookup, distributed.
  *
  * Scale note (SURVEY.md §7.4(3)): a global `row_number` window has no
  * partition key, so Spark funnels all rows through ONE task — fine for
  * dimension tables (small by definition), a bottleneck for 100 TB
  * facts. For large tables use [[withDistributedId]], which assigns
  * unique (dense, but not order-correlated) ids per-partition via
  * `zipWithUniqueId`-style arithmetic without a single-task sort.
  */
object Dims {

  /** Whole-row duplicate elimination (reference :216-219). */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Deterministic dense surrogate id 1..N ordered by `orderBy`.
    * Use for dimensions (small); see scale note above. */
  def withSurrogateId(df: DataFrame, idName: String, orderBy: Seq[Column]): DataFrame =
    df.withColumn(idName, row_number().over(Window.orderBy(orderBy: _*)))

  /** Unique (not dense) 64-bit ids with NO global sort: partition-local
    * row index interleaved with partition id. Scales to any size; ids are
    * stable for a fixed partitioning. */
  def withDistributedId(df: DataFrame, idName: String): DataFrame = {
    val n = df.rdd.getNumPartitions.toLong.max(1L)
    df.withColumn("__pid", spark_partition_id().cast("long"))
      .withColumn("__rn",
        row_number().over(
          Window.partitionBy(col("__pid")).orderBy(monotonically_increasing_id())).cast("long"))
      .withColumn(idName, (col("__rn") - 1L) * n + col("__pid") + 1L)
      .drop("__pid", "__rn")
  }

  /** Replace `keyCol` in `fact` with the dimension's surrogate id
    * (reference :223-228): broadcast left equi-join + drop. The dimension
    * side is explicitly `broadcast()` — it is the (key → id) map, small
    * by construction, so no shuffle of the fact side ever happens. */
  def resolveFk(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      dimIdCol: String,
      outIdCol: String): DataFrame =
    fact.join(
        broadcast(dim.select(col(keyCol), col(dimIdCol).as(outIdCol))),
        Seq(keyCol), "left")
      .drop(keyCol)

  /** FK completeness check (the engine-side analogue of the reference's
    * FOREIGN KEY constraints, SURVEY.md §2 #21): facts with no matching
    * dimension key. Empty ⇔ constraint holds. */
  def fkViolations(fact: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    fact.join(dim.select(col(keyCol)), Seq(keyCol), "left_anti")
}
