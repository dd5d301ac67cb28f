package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  "writePartitioned" should "enable partition pruning" in {
    import spark.implicits._
    val df = Seq(
      ("click", 1L, 1.0), ("view", 2L, 2.0), ("click", 3L, 3.0),
      ("error", 4L, 4.0)
    ).toDF("event_type", "id", "v")
    val path = tmpDir("layout") + "/events_part"
    Layout.writePartitioned(df, path, "event_type")

    val filtered = Layout.readPartitioned(spark, path)
      .filter(col("event_type") === "click")
    filtered.count() shouldBe 2
    // the partition filter must appear in the scan, not as a data filter
    val plan = filtered.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("event_type")
    // directory layout on disk is hive-style
    new java.io.File(path).list().count(_.startsWith("event_type=")) shouldBe 3
  }

  "writeBucketed" should "join two co-bucketed tables without a shuffle" in {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
    val dims = (0L until 50L).map(i => (i, s"dim_$i")).toDF("k", "name")
    Layout.writeBucketed(facts, "b_facts", "k", 8)
    Layout.writeBucketed(dims, "b_dims", "k", 8)
    // disable broadcast so only bucketing can avoid the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
      joined.count() shouldBe 1000
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange"
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
