package graft.ops

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._
  import Quality._

  private lazy val frame = Seq(
    (Some(1L), Some("en"), Some(50L), "srcA"),
    (Some(2L), Some("en"), Some(150L), "srcB"),
    (Some(2L), Some("xx"), Some(5000L), "bad source"),
    (None, None, None, "srcC")
  ).toDF("id", "lang", "n", "src")

  "Quality.expectations" should "count violations per rule with null-as-violation semantics" in {
    val out = expectations(frame, Seq(
        NotNull("id"), Unique("id"),
        InRange("n", 1L, 1000L),
        InSet("lang", Seq("en", "de")),
        Matches("src", "^src[A-Z]$")))
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass"))).toMap
    out("not_null(id)") shouldBe ((1L, false))        // the null row
    out("unique(id)") shouldBe ((2L, false))          // dup 2L + null row
    out("in_range(n,1,1000)") shouldBe ((2L, false))  // 5000 + null
    out("in_set(lang)") shouldBe ((2L, false))        // xx + null
    out("matches(src)") shouldBe ((1L, false))        // "bad source"
    out.values.foreach { case (v, p) => p shouldBe (v == 0L) }
  }

  it should "pass a clean suite and stay partition-invariant" in {
    val clean = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
    val suite = Seq(NotNull("id"), Unique("id"), InSet("lang", Seq("en", "de")))
    val a = expectations(clean, suite).collect().map(_.toSeq).toSeq
    a.foreach(r => r.last shouldBe true)
    expectations(clean.repartition(7), suite).collect()
      .map(_.toSeq).toSeq shouldBe a
  }

  it should "reject duplicate rule names" in {
    an[IllegalArgumentException] should be thrownBy
      expectations(frame, Seq(NotNull("id"), NotNull("id")))
  }
}
