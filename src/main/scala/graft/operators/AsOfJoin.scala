package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampType}

/** As-of join: for each left row, attach the temporally nearest right
  * row with the same key (SURVEY.md §2.1 — no reference implementation;
  * engine extension). The full merge_asof surface (pandas/polars):
  *
  *  - `direction = "backward"` (default): most recent right row with
  *    `rightTime <= leftTime`;
  *  - `direction = "forward"`: earliest right row with
  *    `rightTime >= leftTime`;
  *  - `direction = "nearest"`: whichever of the two is closer in time,
  *    ties to the backward match (pandas's rule);
  *  - `tolerance = Some(t)`: matches farther than `t` away are nulled
  *    out (units: microseconds for timestamp time columns, the raw
  *    integral value otherwise).
  *
  * Implementation is the union-then-window pattern, NOT a cross/range
  * join: tag both sides, union them, and carry the last (backward) /
  * first (forward) non-null right payload across each key ordered by
  * time. One shuffle on the key, no row explosion — at 100 TB this is
  * a single repartition by key + per-partition sort(s), versus the
  * O(left × right-per-key) blow-up of the naive range-join
  * formulation; `nearest` adds a second window ORDER over the same
  * partitioning, never a second exchange. Equal timestamps match in
  * every direction (`<=` / `>=` semantics, like DuckDB's ASOF JOIN).
  * Right rows carrying identical (key, time) are not ordered between
  * themselves — callers needing that determinism must dedup or
  * tie-widen the right side first (same contract as DuckDB ASOF).
  */
object AsOfJoin {

  /** Time column → the integral axis tolerances and nearest-distances
    * are measured on. */
  private def onAxis(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    case _ => c.cast("long")
  }

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param keyCols    equi-key column names present on both sides
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param payload    right-side columns to attach (renamed as given)
    * @param direction  "backward" | "forward" | "nearest"
    * @param tolerance  max |leftTime − matchedTime| on the time axis
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Map[String, String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {

    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction '$direction'")
    val leftCols = left.columns.toSeq
    val payloadSrcByDst = payload.map { case (src, dst) => dst -> src }
    // Tagged union schema: keys ++ __t ++ __side ++ left cols ++ payload
    // ++ __rt (the right row's own time, for tolerance/nearest math).
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keyCols.contains).map(col) ++
          (payload.values.toSeq.map(n => lit(null).cast(
            right.schema(payloadSrcByDst(n)).dataType).as(n)) :+
            lit(null).cast(right.schema(rightTime).dataType).as("__rt")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keyCols.contains)
            .map(n => lit(null).cast(left.schema(n).dataType).as(n)) ++
          (payload.map { case (src, dst) => col(src).as(dst) }.toSeq :+
            col(rightTime).as("__rt")): _*)
    val unioned = lTagged.unionByName(rTagged)

    val fills = payload.values.toSeq :+ "__rt"
    // Backward: right rows sort BEFORE left at the same timestamp → <=.
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward: right rows sort AFTER left at the same timestamp → >=.
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def filledWith(df: DataFrame, prefix: String,
        fill: String => Column): DataFrame =
      fills.foldLeft(df)((d, n) => d.withColumn(s"$prefix$n", fill(n)))

    val tDt = right.schema(rightTime).dataType
    val axis = (c: Column) => onAxis(c, tDt)

    val resolved = direction match {
      case "backward" =>
        val f = filledWith(unioned, "__b_", n =>
          last(col(n), ignoreNulls = true).over(wB))
        chose(f, payload.values.toSeq, "__b_", axis, tolerance)
      case "forward" =>
        val f = filledWith(unioned, "__f_", n =>
          first(col(n), ignoreNulls = true).over(wF))
        chose(f, payload.values.toSeq, "__f_", axis, tolerance)
      case "nearest" =>
        val both = filledWith(
          filledWith(unioned, "__b_", n =>
            last(col(n), ignoreNulls = true).over(wB)),
          "__f_", n => first(col(n), ignoreNulls = true).over(wF))
        // distances on the time axis; a side out of tolerance (or with
        // no match) drops out before the choice
        val db0 = axis(col("__t")) - axis(col("__b___rt"))
        val df0 = axis(col("__f___rt")) - axis(col("__t"))
        val db = tolerance.fold(db0)(t => when(db0 <= t, db0))
        val dfw = tolerance.fold(df0)(t => when(df0 <= t, df0))
        val useB = db.isNotNull && (dfw.isNull || db <= dfw)
        payload.values.toSeq.foldLeft(both) { (d, n) =>
          d.withColumn(n,
            when(useB, col(s"__b_$n"))
              .otherwise(when(dfw.isNotNull, col(s"__f_$n"))))
        }
    }
    resolved
      .filter(col("__side") === 1)
      .drop(resolved.columns.filter(c =>
        c.startsWith("__b_") || c.startsWith("__f_")): _*)
      .drop("__t", "__side", "__rt")
  }

  /** Single-direction resolve: copy the filled values into the payload
    * names, nulling matches outside the tolerance. */
  private def chose(df: DataFrame, names: Seq[String], prefix: String,
      axis: Column => Column, tolerance: Option[Long]): DataFrame = {
    val dist =
      if (prefix == "__b_") axis(col("__t")) - axis(col(s"${prefix}__rt"))
      else axis(col(s"${prefix}__rt")) - axis(col("__t"))
    val ok = tolerance.fold(lit(true))(t => dist <= t)
    names.foldLeft(df)((d, n) =>
      d.withColumn(n, when(ok, col(s"$prefix$n"))))
  }
}
