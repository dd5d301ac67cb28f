package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CapSpec extends SparkSpec {

  // skewed synthetic frame: stratum s0 holds half the rows, scores
  // collide heavily so ties exercise the id tie-break
  private def synth(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val stratum = if (i % 2 == 0) "s0" else s"s${1 + i % 5}"
      (stratum, i.toLong, (i * 31 % 17).toLong)
    }.toDF("stratum", "id", "score")
  }

  private def reference(df: DataFrame, n: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("stratum").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= n)
      .select("stratum", "id", "score")

  "Sampling.capPerStratum" should "match the window row_number reference" in {
    val df = synth(1000).repartition(8)
    val got = Sampling.capPerStratum(df, "stratum", "id", "score", 7)
    val want = reference(df, 7)
    got.count() shouldBe want.count()
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
  }

  it should "keep whole strata when n exceeds the stratum size" in {
    val df = synth(40)
    val got = Sampling.capPerStratum(df, "stratum", "id", "score", 1000)
    got.count() shouldBe 40
  }

  it should "survive the partial-merge path on many partitions" in {
    val df = synth(2000).repartition(32)
    val got = Sampling.capPerStratum(df, "stratum", "id", "score", 3)
    val want = reference(df, 3)
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
  }

  it should "plan as a partial aggregate, never a window" in {
    val df = synth(500)
    val plan = Sampling.capPerStratum(df, "stratum", "id", "score", 7)
      .queryExecution.executedPlan.toString
    // the point of the operator: map-side bounded-heap partials (no
    // whole-group shuffle to a single window task)
    plan should include("ObjectHashAggregate")
    plan should not include "Window"
  }

  "Sampling.uniformPerStratum" should "match the md5-rank window rule and be partitioning-stable" in {
    val df = synth(1200)
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy("stratum").orderBy(
          substring(md5(col("id").cast("string")), 1, 15).desc, col("id"))))
      .filter(col("rn") <= 5)
      .select("stratum", "id")
    val got = Sampling.uniformPerStratum(df.repartition(16), "stratum", "id", 5)
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
    // pure function of the data: identical under a different layout
    val again = Sampling.uniformPerStratum(df.repartition(3), "stratum", "id", 5)
    again.exceptAll(got).count() shouldBe 0
  }
}
