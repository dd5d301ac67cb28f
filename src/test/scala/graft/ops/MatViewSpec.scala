package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Mat-view fold contracts: epoch-grouping invariance (algebraic state
  * + exact decimals ⇒ any split of the stream lands on one table),
  * replay idempotence by construction, value-preserving compaction,
  * and live streaming maintenance parity. */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 100L).map(i =>
    (s"g${i % 4}", i.toDouble / 4)).toDF("g", "v")

  private def view(path: String) =
    MatView.withDerived(MatView.readMatView(spark, path))
      .orderBy("k").collect().map(_.toSeq).toSeq

  it should "be invariant to how the stream is split into epochs" in {
    val base0 = freshDir("mv_split")
    val p2 = base0 + "/two"
    val p5 = base0 + "/five"
    (0 until 2).foreach(i => MatView.writePartial(
      rows.filter(pmod(col("v") * 4, lit(2)) === i), p2, col("g"), col("v"), i.toLong))
    (0 until 5).foreach(i => MatView.writePartial(
      rows.filter(pmod(col("v") * 4, lit(5)) === i), p5, col("g"), col("v"), i.toLong))
    view(p2) shouldBe view(p5)
    // and equals the one-shot aggregate
    val oneShot = MatView.withDerived(
      MatView.aggregate(rows, col("g"), col("v")))
      .orderBy("k").collect().map(_.toSeq).toSeq
    view(p2) shouldBe oneShot
  }

  it should "treat replays and compaction as value no-ops" in {
    val p = freshDir("mv_replay") + "/view"
    (0 until 3).foreach(i => MatView.writePartial(
      rows.filter(pmod(col("v") * 4, lit(3)) === i), p, col("g"), col("v"), i.toLong))
    val before = view(p)
    // at-least-once replay: same batch id, same content
    MatView.writePartial(
      rows.filter(pmod(col("v") * 4, lit(3)) === 1), p, col("g"), col("v"), 1L)
    view(p) shouldBe before
    MatView.compact(spark, p)
    view(p) shouldBe before
    // compaction left exactly one epoch dir
    new java.io.File(p).list().count(_.startsWith("batch=")) shouldBe 1
  }

  it should "maintain the view from a live stream" in {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base1 = freshDir("mv_stream")
    val p = base1 + "/view"
    val mem = MemoryStream[(String, Double)]
    val q = MatView.matViewIngest(
      mem.toDF().toDF("g", "v"), p, base1 + "/ckpt",
      col("g"), col("v"))
    try {
      mem.addData("a" -> 1.0, "a" -> 2.0, "b" -> 5.0)
      q.processAllAvailable()
      mem.addData("a" -> 3.0, "c" -> 7.0)
      q.processAllAvailable()
    } finally q.stop()
    val out = MatView.withDerived(MatView.readMatView(spark, p))
      .orderBy("k")
      .select("k", "n", "total", "mn", "mx")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    out shouldBe Seq(
      ("a", 3L, 6.0, 1.0, 3.0),
      ("b", 1L, 5.0, 5.0, 5.0),
      ("c", 1L, 7.0, 7.0, 7.0))
  }
}
