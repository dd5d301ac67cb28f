package graft.ops

import graft.SparkSpec
import graft.tools.PlanLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graft.ops.GlobalRank — exact distributed row_number / ntile. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def frame(n: Int, parts: Int) = {
    // non-trivial order: rank by (score asc, id asc), ids shuffled
    val rows = (0 until n).map(i => ((i * 7919) % n, (i * 31 + 7) % 97))
    rows.toDF("id", "score").repartition(parts)
  }

  behavior of "GlobalRank.withGlobalRowNumber"

  it should "match the single-partition window exactly" in {
    val df = frame(500, 7)
    val order = Seq(col("score").asc, col("id").asc)
    val dist = GlobalRank.withGlobalRowNumber(df, "rn", order)
      .select(col("id"), col("rn")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ref = df.withColumn("rn", row_number().over(Window.orderBy(order: _*)))
      .select(col("id"), col("rn")).collect()
      .map(r => r.getInt(0) -> r.getInt(1).toLong).toMap
    dist shouldBe ref
  }

  it should "be partition-invariant" in {
    val order = Seq(col("score").asc, col("id").asc)
    def run(parts: Int) =
      GlobalRank.withGlobalRowNumber(frame(300, parts), "rn", order)
        .select(col("id"), col("rn")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toSet
    run(3) shouldBe run(11)
  }

  behavior of "GlobalRank.withNtile"

  it should "match ntile(k) over a global window for uneven and even splits" in {
    val order = Seq(col("score").asc, col("id").asc)
    for (n <- Seq(500, 96, 7); k <- Seq(4, 3, 16)) {
      val df = frame(n, 5)
      val dist = GlobalRank.withNtile(df, k, "stage", order)
        .select(col("id"), col("stage")).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      val ref = df.withColumn("stage", ntile(k).over(Window.orderBy(order: _*)))
        .select(col("id"), col("stage")).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      withClue(s"n=$n k=$k") { dist shouldBe ref }
    }
  }

  it should "handle fewer rows than tiles (first n tiles get one row each)" in {
    val df = Seq((1, 10), (2, 20), (3, 30)).toDF("id", "score")
    val out = GlobalRank.withNtile(df, 8, "stage",
        Seq(col("score").asc, col("id").asc))
      .select(col("id"), col("stage")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    out shouldBe Map(1 -> 1, 2 -> 2, 3 -> 3)
  }

  it should "produce a lint-clean plan (no single-partition window)" in {
    val df = frame(200, 5)
    PlanLint.lint(GlobalRank.withNtile(df, 4, "stage",
      Seq(col("score").asc, col("id").asc))) shouldBe empty
  }
}
