package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Live JDBC integration against embedded Derby (ships with Spark for
  * the Hive metastore): DDL execution, batched writes, table scans,
  * and partitioned parallel reads — the engine's replacement for the
  * reference's one-INSERT-per-row psycopg2 loop (SURVEY.md §2 #8-#10),
  * exercised against a real SQL database end-to-end. */
class JdbcSpec extends SparkSpec {

  private lazy val url = {
    val dir = tmpDir("jdbc")
    s"jdbc:derby:$dir/derbydb;create=true"
  }
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  "Sinks + Sources over JDBC" should "round-trip a batched write" in {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "v")
    // the derby files persist across test runs; Derby has no DROP IF EXISTS
    try Sinks.executeDdl(url, props, "DROP TABLE rt_table")
    catch { case _: java.sql.SQLException => }
    Sinks.executeDdl(url, props,
      "CREATE TABLE rt_table (id BIGINT, name VARCHAR(64), v DOUBLE)")
    Sinks.jdbcBatch(df, url, "rt_table", props, batchSize = 100, numPartitions = 4)

    val back = Sources.jdbc(spark, url, "rt_table", props)
    back.count() shouldBe 500
    back.agg(sum(col("id"))).collect()(0).getLong(0) shouldBe (1L to 500L).sum

    // partitioned parallel read: 4 concurrent range-split connections
    val par = Sources.jdbc(spark, url, "rt_table", props,
      partitionColumn = Some(("id", 1L, 500L, 4)))
    par.rdd.getNumPartitions shouldBe 4
    par.count() shouldBe 500
  }

  it should "push predicates and prune columns into the JDBC scan" in {
    val scan = Sources.jdbc(spark, url, "rt_table", props)
      .filter(col("id") <= 10).select(col("name"))
    scan.collect().length shouldBe 10
    val plan = scan.queryExecution.executedPlan.toString
    // Spark's JDBC relation reports pushed filters in the scan node
    plan should include("PushedFilters")
    plan should include("LessThanOrEqual")
  }
}
