package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  "asOf" should "attach the most recent right row at or before each left time" in {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
      (2L, 15L, "f1")
    ).toDF("user_id", "t", "tag").withColumn("ts", col("t").cast("timestamp"))
    val right = Seq(
      (1L, 10L, 100.0), (1L, 18L, 200.0), (2L, 99L, 999.0)
    ).toDF("user_id", "t", "value").withColumn("ts", col("t").cast("timestamp"))

    val out = AsOfJoin.asOf(
      left.select("user_id", "ts", "tag"),
      right.select("user_id", "ts", "value"),
      keyCols = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      payload = Map("value" -> "last_value"))
      .select("user_id", "tag", "last_value")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet

    out shouldBe Set(
      (1L, "e0", null),        // before any purchase
      (1L, "e1", 100.0),       // equal timestamp matches (<=)
      (1L, "e2", 200.0),       // most recent of two
      (2L, "f1", null))        // right row is later
  }
}
