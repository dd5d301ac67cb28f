package graft

/** The driver's smoke contract: `SparkEntry.entry` must run on the
  * sf0.001 slice and return rows. r15 routed the flagship through the
  * live wire-v3 endpoint and r16 added the distributed fact leg, so
  * this is no longer a pure-plan smoke — it covers server start/stop,
  * DDL, RETURNING head, COPY (driver-side for the dim, distributed
  * exactly-once for the fact), and the typed read-backs on the
  * smallest scale, exactly what the driver checks. */
class SparkEntrySpec extends SparkSpec {

  "SparkEntry.entry" should "return rows on the sf0.001 slice" in {
    val out = SparkEntry.entry(spark)
    out.count() should be > 0L
    // r16 flagship shape: the sampled fact head joined to the dim
    // read-back — every value crossed the wire on one of the two legs
    out.columns.toSeq shouldBe
      Seq("o_orderkey", "customer_id", "o_orderstatus", "c_name", "c_key")
    val rows = out.collect()
    rows.length should be <= 100 // the explicit head sample
    // the head is ordered by its unique order key
    val keys = rows.map(_.getLong(0))
    keys.toSeq shouldBe keys.sorted.toSeq
    // customer ids resolved against the dim's dense wire-assigned ids
    all(rows.map(_.getInt(1))) should be >= 1
  }
}
