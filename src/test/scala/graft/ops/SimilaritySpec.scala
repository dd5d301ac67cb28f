package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  // unit-ish vectors with a known similarity ranking relative to v10
  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (20L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // most similar to 10
      (30L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
      (40L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal to 10
      (50L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
  }

  "bruteForceTopK" should "rank by exact cosine" in {
    val out = Similarity.bruteForceTopK(
        vecs.filter(col("vec_id") === 10), vecs.filter(col("vec_id") =!= 10), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    out.toSeq shouldBe Seq((1, 20L), (2, 30L), (3, 40L))
  }

  "cosineNearDupPairs" should "find exactly the high-cosine pairs" in {
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((10L, 20L)) // cos ≈ 0.9939
  }

  "cosineNearDupPairsBlocked" should "match the broadcast variant exactly" in {
    val broadcastOut = Similarity.cosineNearDupPairs(vecs, threshold = 0.3)
      .collect().map(_.toSeq).toSet
    val blockedOut = Similarity.cosineNearDupPairsBlocked(vecs, threshold = 0.3, blocks = 2)
      .collect().map(_.toSeq).toSet
    blockedOut shouldBe broadcastOut
    blockedOut should not be empty
  }

  "ivfAnnTop1" should "return one nearest neighbor per vector" in {
    val out = Similarity.ivfAnnTop1(vecs, k = 2, nprobe = 2).collect()
    out.length shouldBe 5
    val top10 = out.find(_.getLong(0) == 10L).get
    top10.getLong(1) shouldBe 20L
  }

  "lshAnnTop1" should "be deterministic across runs" in {
    val a = Similarity.lshAnnTop1(vecs, planes = 4, dims = 4).collect().map(_.toSeq)
    val b = Similarity.lshAnnTop1(vecs, planes = 4, dims = 4).collect().map(_.toSeq)
    a should contain theSameElementsAs b
  }
}
