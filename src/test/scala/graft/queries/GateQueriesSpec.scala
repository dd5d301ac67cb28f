package graft.queries

import graft.SparkSpec

/** The round-6 INVARIANT GATE queries, asserted end-to-end at sf0.001
  * without the driver's DuckDB compare: every emitted boolean must be
  * true on the real corpus (the oracle side is `true` literals, so
  * this is the same contract the driver hash-checks at sf0.01). */
class GateQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  "q_dedup_simhash" should "prove two-kernel reproducibility for every document" in {
    val rows = run("q_dedup_simhash").collect()
    rows.length shouldBe 500
    rows.foreach(r => withClue(s"doc ${r.getLong(0)}: ") {
      r.getBoolean(1) shouldBe true
    })
  }

  "q_dedup_simhash_pairs" should "prove banded ≡ brute for every document" in {
    val rows = run("q_dedup_simhash_pairs").collect()
    rows.length shouldBe 500
    rows.foreach(r => withClue(s"doc ${r.getLong(0)}: ") {
      r.getBoolean(1) shouldBe true
    })
  }

  "q_hll_exact" should "hold regime-appropriate estimator accuracy per group" in {
    val rows = run("q_hll_exact").collect()
    rows.length shouldBe 5 // one per event_type
    rows.foreach { r =>
      withClue(s"event_type ${r.getString(0)}: ") {
        r.getLong(1) should be > 0L                  // exact_users
        r.getLong(2) + r.getLong(3) shouldBe 256L    // n_buckets + zero_buckets
        r.getLong(5) should be > 0L                  // harmonic_den
        r.getDouble(6) should be > 0.0               // est_raw
        r.getBoolean(7) shouldBe true                // approx_ok
      }
    }
  }

  "q_text_heavy_hitters" should "find every exact heavy hitter in the sketch" in {
    val rows = run("q_text_heavy_hitters").collect()
    rows.length should be > 0
    rows.foreach { r =>
      withClue(s"term ${r.getString(0)}: ") {
        r.getBoolean(2) shouldBe true // in_sketch
        r.getBoolean(3) shouldBe true // est_ok
        r.getLong(1) should be > 0L
      }
    }
  }

  "ANN gate rows" should "hold recall, coverage, and validity invariants" in {
    for (name <- Seq("q_ann_ivf", "q_ann_lsh")) {
      val rows = run(name).collect()
      rows.length shouldBe 1
      val r = rows(0)
      withClue(s"$name: ") {
        r.getLong(1) should be > 0L    // n_queries
        r.getBoolean(2) shouldBe true  // recall_ok
        r.getBoolean(3) shouldBe true  // covered_all
        r.getBoolean(4) shouldBe true  // cos_valid
      }
    }
    val topk = run("q_ann_lsh_topk").collect()
    topk.length shouldBe 1
    topk(0).getBoolean(2) shouldBe true // recall_ok @3
    topk(0).getBoolean(3) shouldBe true // k_ok
    topk(0).getBoolean(4) shouldBe true // cos_valid (rank-monotone)
    val idx = run("q_ann_index").collect()
    idx.length shouldBe 1
    idx(0).getBoolean(2) shouldBe true // recall_ok @3 through the index
    idx(0).getBoolean(3) shouldBe true // k_ok (3 distinct non-self)
    idx(0).getBoolean(4) shouldBe true // cos_valid
  }

  "q_events_stream_parity" should "match the batch tumbling frame window-for-window" in {
    val rows = run("q_events_stream_parity").collect()
    rows.length should be > 0
    rows.foreach(r => withClue(s"window ${r.get(0)}/${r.getString(1)}: ") {
      r.getBoolean(4) shouldBe true
    })
  }

  "q_events_stream_join" should "match the stream-stream attribution join pair-for-pair" in {
    val rows = run("q_events_stream_join").collect()
    rows.length should be > 0
    rows.foreach(r =>
      withClue(s"pair ${r.getLong(1)}/${r.getLong(2)}: ") {
        r.getBoolean(5) shouldBe true
      })
  }

  "q_dedup_stream_parity" should "match streamed dedup decisions to the batch path" in {
    val rows = run("q_dedup_stream_parity").collect()
    rows.length should be > 0
    rows.foreach(r => withClue(s"doc ${r.getLong(0)}: ") {
      r.getBoolean(1) shouldBe true
    })
  }

  "q_bloom_persisted" should "hold every persisted-filter invariant on the real corpus" in {
    val rows = run("q_bloom_persisted").collect()
    rows.length shouldBe 5
    rows.foreach(r => withClue(s"side ${r.getString(0)}: ") {
      r.getLong(1) should be > 0L
      r.getBoolean(2) shouldBe true
    })
  }

  "q_bloom_exact" should "probe identically through both kernels with zero false negatives" in {
    val rows = run("q_bloom_exact").collect()
    rows.length shouldBe 4 // (absent, present) × (bc, join)
    val bySide = rows.groupBy(_.getString(0))
    bySide("present").foreach { r =>
      withClue(s"present/${r.getString(1)}: ") {
        r.getLong(3) shouldBe r.getLong(2) // zero false negatives
      }
    }
    bySide("absent").foreach { r =>
      withClue(s"absent/${r.getString(1)}: ") {
        r.getLong(3).toDouble should be <= 0.02 * r.getLong(2)
      }
    }
    // deterministic bits ⇒ the two kernels agree exactly per side
    bySide.values.foreach(rs => rs.map(_.getLong(3)).distinct.length shouldBe 1)
  }

  "q_shard_stream" should "match the one-shot layout shard-for-shard after compaction" in {
    val rows = run("q_shard_stream").collect()
    rows.length shouldBe 16
    rows.foreach(r => withClue(s"shard ${r.getString(0)}: ") {
      r.getLong(1) should be > 0L
      r.getBoolean(5) shouldBe true
    })
  }

  "ref_io round-trips" should "reproduce nation through the CSV sink and XLSX DSv2" in {
    val csv = run("ref_io_csv_roundtrip").collect()
    csv.length shouldBe 25
    csv.map(_.getInt(0)).toSeq shouldBe (0 until 25)
    val xlsx = run("ref_io_xlsx_scan").collect()
    xlsx.length shouldBe 25
    xlsx.map(_.getString(0)).distinct.length shouldBe 25
  }
}
