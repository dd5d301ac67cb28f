package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * the same key and `rightTime <= leftTime` (SURVEY.md §2.1 — no
  * reference implementation; engine extension).
  *
  * Implementation is the union-then-window pattern, NOT a cross/range
  * join: tag both sides, union them, and carry the last non-null right
  * payload forward within each key ordered by time. One shuffle on the
  * key, no row explosion — at 100 TB this is a single repartition by
  * key + per-partition sort, versus the O(left × right-per-key)
  * blow-up of the naive range-join formulation. Equal timestamps match
  * (right row sorts before left at the same instant, i.e. `<=`
  * semantics, like DuckDB's `ASOF JOIN ... ON l.t >= r.t`).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param keyCols    equi-key column names present on both sides
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param payload    right-side columns to attach (renamed as given)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Map[String, String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val payloadSrcByDst = payload.map { case (src, dst) => dst -> src }
    // Tagged union schema: keys ++ __t ++ __side ++ left cols ++ payload.
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keyCols.contains).map(col) ++
          payload.values.toSeq.map(n => lit(null).cast(
            right.schema(payloadSrcByDst(n)).dataType).as(n)): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keyCols.contains)
            .map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++
          payload.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)

    // Right rows sort before left rows at the same timestamp → `<=`.
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = payload.values.foldLeft(lTagged.unionByName(rTagged)) {
      case (df, name) =>
        df.withColumn(name, last(col(name), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1)
      .drop("__t", "__side")
  }
}
