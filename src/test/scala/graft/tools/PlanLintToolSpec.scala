package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graft.tools.PlanLint unit coverage — each violation kind fires on a
  * crafted unbounded plan and stays silent on its bounded twin (the
  * sweep in PlanLintSpec proves the engine clean; THIS spec proves the
  * lint itself can still detect the disease). */
class PlanLintToolSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = spark.range(0, 1000).toDF("id")
    .withColumn("v", pmod(col("id") * 31, lit(97)))

  behavior of "PlanLint"

  it should "flag a single-partition window over a raw scan" in {
    val bad = corpus.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))))
    PlanLint.lint(bad).map(_.kind) should contain("single-partition-window")
  }

  it should "accept the same window over a limit-bounded cut" in {
    val cut = corpus.orderBy(col("v"), col("id")).limit(10)
      .withColumn("rn", row_number().over(Window.orderBy(col("v"), col("id"))))
    PlanLint.lint(cut) shouldBe empty
  }

  it should "accept partitioned windows regardless of input size" in {
    val ok = corpus.withColumn("rn",
      row_number().over(Window.partitionBy(col("v")).orderBy(col("id"))))
    PlanLint.lint(ok) shouldBe empty
  }

  it should "flag an unbounded cartesian product and accept a grand-aggregate side" in {
    val other = spark.range(0, 500).toDF("k")
    // force a true CartesianProductExec (auto-broadcast would plan BNLJ
    // on frames this small — flagged too, but not the kind under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        corpus.crossJoin(other).queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    PlanLint.lint(plan).map(_.kind) should contain("cartesian-product")
    // the 1-row normalizer idiom (ops.Graph): broadcast grand aggregate
    val norm = corpus.crossJoin(broadcast(corpus.agg(sum(col("v")).as("tot"))))
    PlanLint.lint(norm) shouldBe empty
  }

  it should "flag an unbounded broadcast-nested-loop join and accept a bounded side" in {
    val other = spark.range(0, 500).toDF("k")
    val bnl = corpus.join(broadcast(other), col("id") < col("k"))
    PlanLint.lint(bnl).map(_.kind) should contain("broadcast-nested-loop-join")
    val bounded = corpus.join(broadcast(other.limit(5)), col("id") < col("k"))
    PlanLint.lint(bounded) shouldBe empty
  }

  it should "treat a join of bounded and unbounded sides as unbounded" in {
    // boundedness must NOT leak through a join: limit(5) ⋈ corpus is
    // corpus-sized, so a global window above it still flags
    val joined = corpus.limit(5).withColumnRenamed("id", "jid")
      .join(corpus, col("jid") === pmod(col("id"), lit(5)))
    val bad = joined.withColumn("rn",
      row_number().over(Window.orderBy(col("id"))))
    PlanLint.lint(bad).map(_.kind) should contain("single-partition-window")
  }
}
