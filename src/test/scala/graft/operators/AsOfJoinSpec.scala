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

  private def fixture = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
      (2L, 15L, "f1")
    ).toDF("user_id", "t", "tag").withColumn("ts", col("t").cast("timestamp"))
    val right = Seq(
      (1L, 10L, 100.0), (1L, 18L, 200.0), (2L, 99L, 999.0)
    ).toDF("user_id", "t", "value").withColumn("ts", col("t").cast("timestamp"))
    (left.select("user_id", "ts", "tag"), right.select("user_id", "ts", "value"))
  }

  private def run(direction: String, tolerance: Option[Long]) = {
    val (l, r) = fixture
    AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "ts",
        Map("value" -> "v"), direction, tolerance)
      .select("user_id", "tag", "v")
      .collect().map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) null else x.getDouble(2))).toSet
  }

  it should "attach the earliest right row at or after each left time (forward)" in {
    run("forward", None) shouldBe Set(
      (1L, "e0", 100.0),  // next purchase at t=10
      (1L, "e1", 100.0),  // equal timestamp matches (>=)
      (1L, "e2", null),   // nothing later
      (2L, "f1", 999.0))  // the future purchase
  }

  it should "pick the closer side with ties backward (nearest)" in {
    run("nearest", None) shouldBe Set(
      (1L, "e0", 100.0),  // only a forward match (5 -> 10)
      (1L, "e1", 100.0),  // exact hit
      (1L, "e2", 200.0),  // backward 2 < nothing forward
      (2L, "f1", 999.0))  // only forward
    // a genuine tie: left at 14 sits 4 from both 10 and 18 -> backward
    import spark.implicits._
    val l = Seq((1L, 14L, "mid")).toDF("user_id", "t", "tag")
      .withColumn("ts", col("t").cast("timestamp")).select("user_id", "ts", "tag")
    val r = fixture._2
    val got = AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "ts",
        Map("value" -> "v"), "nearest", None)
      .select("v").head().getDouble(0)
    got shouldBe 100.0
  }

  it should "null out matches beyond the tolerance in every direction" in {
    // timestamps: tolerance is measured in MICROSECONDS
    val us = 1000000L
    run("backward", Some(2L * us)) shouldBe Set(
      (1L, "e0", null), (1L, "e1", 100.0),
      (1L, "e2", 200.0),  // 20 - 18 = 2 <= 2
      (2L, "f1", null))
    run("forward", Some(4L * us)) shouldBe Set(
      (1L, "e0", null),   // 10 - 5 = 5 > 4
      (1L, "e1", 100.0), (1L, "e2", null),
      (2L, "f1", null))   // 99 - 15 >> 4
    run("nearest", Some(4L * us)) shouldBe Set(
      (1L, "e0", null),   // closest is 5 away
      (1L, "e1", 100.0), (1L, "e2", 200.0),
      (2L, "f1", null))
  }

  it should "match a plain Scala reference on random streams in every direction" in {
    import spark.implicits._
    val rng = new scala.util.Random(4242)
    // distinct right timestamps per key (the operator's documented
    // determinism contract), left times drawn freely
    val keys = 1L to 5L
    val right = keys.flatMap { k =>
      rng.shuffle((1 to 200).toList).take(8).map(t => (k, t.toLong, rng.nextDouble()))
    }
    val left = (1 to 120).map { i =>
      (i.toLong, keys(rng.nextInt(keys.length)), (1 + rng.nextInt(200)).toLong)
    }
    val lDf = left.toDF("event_id", "user_id", "t")
      .withColumn("ts", col("t").cast("timestamp")).select("event_id", "user_id", "ts")
    val rDf = right.toDF("user_id", "t", "value")
      .withColumn("ts", col("t").cast("timestamp")).select("user_id", "ts", "value")
    val byKey = right.groupBy(_._1)
    val tol = 37L
    def ref(direction: String, tolerance: Option[Long]): Map[Long, Option[Double]] =
      left.map { case (id, k, lt) =>
        val rs = byKey.getOrElse(k, Nil)
        def within(rt: Long) = tolerance.forall(t => math.abs(lt - rt) <= t)
        val back = rs.filter(r => r._2 <= lt && within(r._2)).sortBy(_._2).lastOption
        val fwd = rs.filter(r => r._2 >= lt && within(r._2)).sortBy(_._2).headOption
        val pick = direction match {
          case "backward" => back
          case "forward" => fwd
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (lt - b._2 <= f._2 - lt) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
        }
        id -> pick.map(_._3)
      }.toMap
    for (d <- Seq("backward", "forward", "nearest");
         t <- Seq(None, Some(tol * 1000000L))) {
      val got = AsOfJoin.asOf(lDf, rDf, Seq("user_id"), "ts", "ts",
          Map("value" -> "v"), d, t)
        .select(col("event_id"), col("v"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      withClue(s"direction=$d tolerance=$t: ") {
        got shouldBe ref(d, t.map(_ / 1000000L))
      }
    }
  }

  it should "attach ALL payload columns from the matched row, including its NULLs" in {
    // r13 ADVICE: independent per-column last/first(ignoreNulls) fills
    // skipped a matched row's NULL payload value and pulled that column
    // from an OLDER right row — mixing values across rows, unlike
    // pandas merge_asof. The struct fill pins every attached column
    // (and the tolerance distance) to one matched row.
    import spark.implicits._
    val l = Seq((1L, 20L, "probe")).toDF("user_id", "t", "tag")
      .withColumn("ts", col("t").cast("timestamp")).select("user_id", "ts", "tag")
    val r = Seq(
      (1L, 10L, Some(100.0), "old"),
      (1L, 18L, Option.empty[Double], "new")
    ).toDF("user_id", "t", "value", "label")
      .withColumn("ts", col("t").cast("timestamp"))
      .select("user_id", "ts", "value", "label")
    val pay = Map("value" -> "v", "label" -> "lbl")
    val back = AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "ts", pay)
      .select("v", "lbl").head()
    back.isNullAt(0) shouldBe true   // the matched row's value IS null
    back.getString(1) shouldBe "new" // both columns from the t=18 row
    // tolerance: the distance is measured to the SAME row the payload
    // comes from — t=18 is within 3, t=10 (the old fill source) is not
    val near = AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "ts", pay,
      "nearest", Some(3L * 1000000L))
      .select("v", "lbl").head()
    near.isNullAt(0) shouldBe true
    near.getString(1) shouldBe "new"
    // forward from t=5: earliest match is t=10 → value present
    val l2 = Seq((1L, 5L, "p2")).toDF("user_id", "t", "tag")
      .withColumn("ts", col("t").cast("timestamp")).select("user_id", "ts", "tag")
    val fwd = AsOfJoin.asOf(l2, r, Seq("user_id"), "ts", "ts", pay, "forward")
      .select("v", "lbl").head()
    fwd.getDouble(0) shouldBe 100.0
    fwd.getString(1) shouldBe "old"
  }

  it should "be invariant under repartitioning in every direction" in {
    val (l, r) = fixture
    Seq("backward", "forward", "nearest").foreach { d =>
      val a = AsOfJoin.asOf(l, r, Seq("user_id"), "ts", "ts",
          Map("value" -> "v"), d).orderBy("user_id", "tag")
        .collect().map(_.toSeq).toSeq
      val b = AsOfJoin.asOf(l.repartition(7), r.repartition(3),
          Seq("user_id"), "ts", "ts", Map("value" -> "v"), d)
        .orderBy("user_id", "tag").collect().map(_.toSeq).toSeq
      withClue(s"direction $d: ")(b shouldBe a)
    }
  }
}
