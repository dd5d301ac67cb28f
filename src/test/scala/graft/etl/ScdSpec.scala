package graft.etl

import graft.SparkSpec
import graft.io.Layout
import org.apache.spark.sql.functions._

/** Crafted-history contracts for the warehouse-maintenance operators:
  * SCD2 islands (incl. null transitions and ties), upsert merge
  * semantics, snapshot-diff classification — all partitioning-stable. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val history = Seq(
    // key, t, tie, attr
    (1L, 10L, 1L, "a"), (1L, 20L, 1L, "a"),   // island 1: a @10
    (1L, 30L, 1L, "b"),                        // island 2: b @30
    (1L, 40L, 1L, null.asInstanceOf[String]),  // island 3: null @40
    (1L, 50L, 1L, null.asInstanceOf[String]),  // (null == null: same island)
    (1L, 60L, 1L, "a"),                        // island 4: back to a @60
    (2L, 10L, 2L, "x"),                        // single-row key
    (3L, 10L, 1L, "p"), (3L, 10L, 2L, "q")     // tie on t: broken by tie col
  ).toDF("k", "t", "tie", "attr")

  behavior of "Scd.scd2FromEvents"

  it should "collapse runs into versioned validity intervals" in {
    val out = Scd.scd2FromEvents(history, col("k"), col("t"),
      Seq(col("attr")), Seq(col("tie")))
      .select("k", "version", "attr", "effective_from", "effective_to",
        "is_current")
      .orderBy("k", "version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5)))
    out.toSeq shouldBe Seq(
      (1L, 1L, "a", 10L, Some(30L), false),
      (1L, 2L, "b", 30L, Some(40L), false),
      (1L, 3L, null, 40L, Some(60L), false),
      (1L, 4L, "a", 60L, None, true),
      (2L, 1L, "x", 10L, None, true),
      (3L, 1L, "p", 10L, Some(10L), false),
      (3L, 2L, "q", 10L, None, true))
  }

  it should "emit identical history under any partitioning" in {
    val a = Scd.scd2FromEvents(history, col("k"), col("t"),
      Seq(col("attr")), Seq(col("tie"))).orderBy("k", "version")
      .collect().map(_.toSeq).toSeq
    val b = Scd.scd2FromEvents(history.repartition(7, col("attr")),
      col("k"), col("t"), Seq(col("attr")), Seq(col("tie")))
      .orderBy("k", "version").collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  behavior of "Scd.scd2Apply"

  it should "equal the from-scratch rebuild on a split stream" in {
    // full stream: multi-island keys, a no-op re-observation, a key
    // that only exists pre-cut, one that only exists post-cut
    val full = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 1L, "b"),  // pre: a,b
      (1L, 30L, 1L, "b"), (1L, 40L, 1L, "c"),  // post: no-op b, then c
      (2L, 10L, 1L, "x"),                      // pre only — untouched
      (3L, 30L, 1L, "p"), (3L, 35L, 1L, "q"),  // post only — new key
      (4L, 10L, 1L, "m"),                      // pre
      (4L, 30L, 1L, "m"), (4L, 40L, 1L, "m")   // post: all no-ops
    ).toDF("k", "t", "tie", "attr")
    val cut = 25L
    val cols = Seq("k", "version", "attr", "effective_from",
      "effective_to", "is_current")
    val rebuild = Scd.scd2FromEvents(full, col("k"), col("t"),
      Seq(col("attr")), Seq(col("tie")))
      .select(cols.map(col): _*).orderBy("k", "version")
      .collect().map(_.toSeq).toSeq
    val hist = Scd.scd2FromEvents(full.filter(col("t") < cut),
      col("k"), col("t"), Seq(col("attr")), Seq(col("tie")))
      .select("k", "version", "effective_from", "effective_to",
        "is_current", "attr")
    val applied = Scd.scd2Apply(hist, full.filter(col("t") >= cut),
      "k", "t", Seq("attr"), Seq("tie"))
      .select(cols.map(col): _*).orderBy("k", "version")
      .collect().map(_.toSeq).toSeq
    applied shouldBe rebuild
  }

  it should "reject observations at or before the current version" in {
    val hist = Scd.scd2FromEvents(
      Seq((1L, 10L, 1L, "a"), (1L, 20L, 1L, "b")).toDF("k", "t", "tie", "attr"),
      col("k"), col("t"), Seq(col("attr")), Seq(col("tie")))
      .select("k", "version", "effective_from", "effective_to",
        "is_current", "attr")
    val late = Seq((1L, 15L, 1L, "z")).toDF("k", "t", "tie", "attr")
    an[IllegalArgumentException] should be thrownBy
      Scd.scd2Apply(hist, late, "k", "t", Seq("attr"), Seq("tie"))
  }

  behavior of "Scd.upsertByKey"

  it should "replace matched keys, keep unmatched, append new" in {
    val existing = Seq((1L, "old1"), (2L, "old2"), (3L, "old3"))
      .toDF("k", "v")
    val updates = Seq((2L, "new2"), (9L, "new9")).toDF("k", "v")
    val out = Scd.upsertByKey(existing, updates, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    out shouldBe Seq((1L, "old1"), (2L, "new2"), (3L, "old3"), (9L, "new9"))
  }

  it should "reject mismatched schemas" in {
    val e = Seq((1L, "x")).toDF("k", "v")
    val u = Seq((1L, "x")).toDF("k", "other")
    an[IllegalArgumentException] should be thrownBy
      Scd.upsertByKey(e, u, Seq("k"))
  }

  behavior of "Scd.snapshotDiff"

  it should "classify inserts, deletes, updates, and null moves" in {
    val before = Seq(
      (1L, "same"), (2L, "gone"), (3L, "was"),
      (4L, null.asInstanceOf[String]), (5L, "tonull"))
      .toDF("k", "v")
    val after = Seq(
      (1L, "same"), (3L, "now"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]),
      (6L, "fresh")).toDF("k", "v")
    val out = Scd.snapshotDiff(before, after, Seq("k"))
      .select(col("k"), col("change"),
        col("before.v").as("b"), col("after.v").as("a"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3))).toSeq
    out shouldBe Seq(
      (2L, "delete", "gone", null),
      (3L, "update", "was", "now"),
      (5L, "update", "tonull", null),   // value → null IS a change
      (6L, "insert", null, "fresh"))
      // key 1 (unchanged) and key 4 (null == null) are absent
  }

  behavior of "Scd bucketed maintenance"

  // the scaladoc promise: bucket both sides on the key and the
  // maintenance exchanges disappear ENTIRELY, with the results
  // byte-identical to the plain (shuffling) path
  it should "run upsert and diff exchange-free over co-bucketed tables" in {
    val cur = (1L to 500L).map(i => (i, s"name_$i", s"seg_${i % 5}"))
      .toDF("k", "name", "seg")
    val upd = (1L to 500L).filter(_ % 2 == 0)
      .map(i => (i, s"NAME_$i", "UPDATED")).toDF("k", "name", "seg")
    val aft = (1L to 500L).filterNot(_ % 11 == 0)
      .map(i => (i, s"name_$i", if (i % 7 == 0) "MOVED" else s"seg_${i % 5}"))
      .toDF("k", "name", "seg")
    Layout.writeBucketed(cur, "bk_scd_cur", "k", 4)
    Layout.writeBucketed(upd, "bk_scd_upd", "k", 4)
    Layout.writeBucketed(aft, "bk_scd_aft", "k", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val mergedBk = Scd.upsertByKey(
        spark.table("bk_scd_cur").hint("merge"),
        spark.table("bk_scd_upd").hint("merge"), Seq("k"))
      mergedBk.queryExecution.executedPlan.toString should
        not include "Exchange"
      val diffBk = Scd.snapshotDiff(
        spark.table("bk_scd_cur").hint("merge"),
        spark.table("bk_scd_aft").hint("merge"), Seq("k"))
      diffBk.queryExecution.executedPlan.toString should
        not include "Exchange"
      // value parity with the plain path (which DOES shuffle)
      mergedBk.orderBy("k").collect().toSeq shouldBe
        Scd.upsertByKey(cur, upd, Seq("k")).orderBy("k").collect().toSeq
      diffBk.orderBy("k").collect().toSeq shouldBe
        Scd.snapshotDiff(cur, aft, Seq("k")).orderBy("k").collect().toSeq
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      Seq("bk_scd_cur", "bk_scd_upd", "bk_scd_aft")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  behavior of "Scd.snapshotAt"

  it should "return each key's one valid version with half-open boundaries" in {
    import spark.implicits._
    val hist = Scd.scd2FromEvents(
      Seq(
        ("a", "2020-01-01", 1, "x"), ("a", "2020-03-01", 2, "y"),
        ("b", "2020-06-01", 3, "z"))
        .toDF("k", "ts", "seq", "attr")
        .withColumn("ts", col("ts").cast("timestamp")),
      col("k"), col("ts"), tracked = Seq(col("attr")),
      tieCols = Seq(col("seq")))
    def at(ts: String) =
      Scd.snapshotAt(hist, lit(ts).cast("timestamp"))
        .select(col("k"), col("version"), col("is_current"))
        .orderBy(col("k")).collect().map(r => (r.getString(0), r.getLong(1)))
    // mid-first-interval: only a@v1; b not yet born
    at("2020-02-01").toSeq shouldBe Seq(("a", 1L))
    // AT a boundary the new version holds (from <= ts < to, half-open)
    at("2020-03-01").toSeq shouldBe Seq(("a", 2L))
    // after every birth: both keys' current rows
    at("2020-07-01").toSeq shouldBe Seq(("a", 2L), ("b", 1L))
    // before everything: empty — no key existed yet
    at("2019-01-01").toSeq shouldBe Seq()
  }
}
