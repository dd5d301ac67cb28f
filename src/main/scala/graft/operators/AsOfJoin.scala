package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType, TimestampType}

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
  *
  * All attached columns come from the SAME matched right row: the fill
  * carries ONE struct of (payload…, rightTime) per direction, so a
  * matched row whose payload value is NULL attaches that NULL (pandas
  * merge_asof semantics) — it is never skipped in favor of an
  * older/farther row, and the tolerance distance is always measured to
  * the row the payload came from.
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
    // ONE match struct per right row — payloads and the right row's own
    // time (for tolerance/nearest math) fill TOGETHER, so every
    // attached column refers to the same matched row even when some
    // payload values are NULL. Left rows carry a NULL struct
    // (ignoreNulls skips them; a right row's struct is never null).
    val mType = StructType(
      payload.map { case (src, dst) =>
        StructField(dst, right.schema(src).dataType) }.toSeq :+
        StructField("__rt", right.schema(rightTime).dataType))
    // Tagged union schema: keys ++ __t ++ __side ++ left cols ++ __m.
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keyCols.contains).map(col) :+
          lit(null).cast(mType).as("__m"): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (keyCols.map(col) :+ col("__t") :+ col("__side")) ++
          leftCols.filterNot(keyCols.contains)
            .map(n => lit(null).cast(left.schema(n).dataType).as(n)) :+
          struct(payload.map { case (src, dst) => col(src).as(dst) }.toSeq :+
            col(rightTime).as("__rt"): _*).as("__m"): _*)
    val unioned = lTagged.unionByName(rTagged)

    // Backward: right rows sort BEFORE left at the same timestamp → <=.
    val wB = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward: right rows sort AFTER left at the same timestamp → >=.
    val wF = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val tDt = right.schema(rightTime).dataType
    val axis = (c: Column) => onAxis(c, tDt)
    val dsts = payload.values.toSeq

    val resolved = direction match {
      case "backward" =>
        val f = unioned.withColumn("__b_m",
          last(col("__m"), ignoreNulls = true).over(wB))
        chose(f, dsts, "__b_m", axis, tolerance)
      case "forward" =>
        val f = unioned.withColumn("__f_m",
          first(col("__m"), ignoreNulls = true).over(wF))
        chose(f, dsts, "__f_m", axis, tolerance)
      case "nearest" =>
        val both = unioned
          .withColumn("__b_m", last(col("__m"), ignoreNulls = true).over(wB))
          .withColumn("__f_m", first(col("__m"), ignoreNulls = true).over(wF))
        // distances on the time axis; a side out of tolerance (or with
        // no match) drops out before the choice
        val db0 = axis(col("__t")) - axis(col("__b_m").getField("__rt"))
        val df0 = axis(col("__f_m").getField("__rt")) - axis(col("__t"))
        val db = tolerance.fold(db0)(t => when(db0 <= t, db0))
        val dfw = tolerance.fold(df0)(t => when(df0 <= t, df0))
        val useB = db.isNotNull && (dfw.isNull || db <= dfw)
        dsts.foldLeft(both) { (d, n) =>
          d.withColumn(n,
            when(useB, col("__b_m").getField(n))
              .otherwise(when(dfw.isNotNull, col("__f_m").getField(n))))
        }
    }
    resolved
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__m", "__b_m", "__f_m")
  }

  /** Single-direction resolve: project the matched struct's payload
    * fields out, nulling matches outside the tolerance. */
  private def chose(df: DataFrame, names: Seq[String], mCol: String,
      axis: Column => Column, tolerance: Option[Long]): DataFrame = {
    val dist =
      if (mCol == "__b_m") axis(col("__t")) - axis(col(mCol).getField("__rt"))
      else axis(col(mCol).getField("__rt")) - axis(col("__t"))
    val ok = tolerance.fold(lit(true))(t => dist <= t)
    names.foldLeft(df)((d, n) =>
      d.withColumn(n, when(ok, col(mCol).getField(n))))
  }
}
