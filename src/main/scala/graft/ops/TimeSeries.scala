package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization (round-11): aggregate an event stream to
  * a fixed calendar grain, then FILL THE GAPS — the step every
  * trailing-window / period-over-period analysis silently requires
  * (a month with no orders must contribute a zero to a 3-month moving
  * sum, not vanish and shift the window).
  *
  * Plan shape: one partial-agg exchange for the per-(key, bucket)
  * aggregate, one metadata-sized envelope aggregate (global min/max
  * bucket), and the SPINE is generated executor-side with `sequence()`
  * (keys × months rows — grid-sized, it never touches the event
  * stream) and left-joins the aggregate. The moving window then runs
  * per key over the REGULAR grid, so its frame arithmetic is exact row
  * counts, not calendar guesswork. All values stay exact DECIMAL until
  * the output hop (rule 1/3).
  */
object TimeSeries {

  /** Per-(key, month) sums over a gap-free monthly spine spanning the
    * corpus envelope, zero-filled, with a trailing `windowMonths`-month
    * moving sum per key.
    *
    * @return key, month, n (0 on gap months), total_d / trailing_d
    *         (exact decimals) */
  def gapFillMonthly(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      valueCol: Column,
      windowMonths: Int = 3): DataFrame = {
    val monthly = df
      .groupBy(keyCol.as("k"), date_trunc("month", tsCol).as("month"))
      .agg(count(lit(1)).as("n"),
        sum(valueCol.cast("decimal(18,2)")).cast("decimal(18,2)").as("total_d"))
    val envelope = df.agg(
      date_trunc("month", min(tsCol)).as("lo"),
      date_trunc("month", max(tsCol)).as("hi"))
    val spine = monthly.select(col("k")).distinct()
      .crossJoin(broadcast(envelope))
      .select(col("k"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 month")))
          .as("month"))
    val filled = spine.join(monthly, Seq("k", "month"), "left")
      .select(col("k"), col("month"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_d"), lit(0).cast("decimal(18,2)")).as("total_d"))
    val w = Window.partitionBy(col("k")).orderBy(col("month"))
      .rowsBetween(-(windowMonths - 1), 0)
    filled.withColumn("trailing_d",
      sum(col("total_d")).over(w).cast("decimal(20,2)"))
  }
}
