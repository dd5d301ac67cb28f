package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-fill contract: missing months materialize as real zeros, the
  * trailing sum therefore ages values OUT after `windowMonths` rows,
  * and the spine spans exactly the corpus envelope. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  it should "zero-fill gaps and age values out of the trailing window" in {
    // key "a": value 10 in Jan, NOTHING in Feb/Mar, 5 in Apr
    val df = Seq(
      ("a", ts("2024-01-15"), 10.0),
      ("a", ts("2024-04-02"), 5.0),
      ("b", ts("2024-01-01"), 1.0),
      ("b", ts("2024-04-30"), 2.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.gapFillMonthly(df, col("k"), col("t"), col("v"))
      .select(col("k"), col("month"), col("n"),
        col("total_d").cast("double"), col("trailing_d").cast("double"))
      .as[(String, Timestamp, Long, Double, Double)]
      .collect().map(r => (r._1, r._2.toString.take(7)) -> (r._3, r._4, r._5))
      .toMap
    // 4-month spine per key — gaps present as rows
    out.size shouldBe 8
    out(("a", "2024-02")) shouldBe ((0L, 0.0, 10.0)) // Jan still in window
    out(("a", "2024-03")) shouldBe ((0L, 0.0, 10.0))
    // Apr: Jan aged OUT of the 3-month frame — only Apr's 5 remains
    out(("a", "2024-04")) shouldBe ((1L, 5.0, 5.0))
    out(("b", "2024-01")) shouldBe ((1L, 1.0, 1.0))
    out(("b", "2024-04")) shouldBe ((1L, 2.0, 2.0))
  }
}
