package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "completely different words appear in this document here"),
      (4L, "the quick brown fox jumps over the lazy dog tonight") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  "exactGroups" should "group identical texts" in {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    g.length shouldBe 3
    val dup = g.find(_.getLong(2) == 2).get
    dup.getLong(1) shouldBe 1L // keep_id = min doc_id
  }

  "minhashNearDups" should "find the planted near-dup pair and the exact dup" in {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain(1L, 4L) // jaccard 1.0
    pairs should contain(1L, 2L) // one word differs → high jaccard
    pairs should not contain ((1L, 3L))
  }

  "ngramJaccardPairs" should "agree with minhash on this corpus" in {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact shouldBe lsh
  }

  "simhash" should "place near-dups closer than unrelated docs" in {
    val sh = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh(1L) shouldBe sh(4L) // identical text → identical signature
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    near should be < far
  }
}
