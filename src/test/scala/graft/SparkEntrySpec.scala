package graft

/** The driver's smoke contract: `SparkEntry.entry` must run on the
  * sf0.001 slice and return rows. r15 routed the flagship through the
  * live wire-v3 endpoint, so this is no longer a pure-plan smoke — it
  * covers server start/stop, DDL, RETURNING head, COPY, and the typed
  * read-back on the smallest scale, exactly what the driver checks. */
class SparkEntrySpec extends SparkSpec {

  "SparkEntry.entry" should "return rows on the sf0.001 slice" in {
    val out = SparkEntry.entry(spark)
    out.count() should be > 0L
    // the wire read-back preserves the dense ordered surrogate ids
    val ids = out.select("id").collect().map(_.getInt(0))
    ids.take(5) shouldBe Array(1, 2, 3, 4, 5)
    ids.length shouldBe ids.max
  }
}
