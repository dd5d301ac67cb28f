package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy k-center contracts beyond the oracle replay: a hand
  * geometry, the greedy monotone-radius invariant, partitioning
  * invariance, and selected-set sanity. */
class CoresetSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  it should "select the hand-derivable centers on a 1-D geometry" in {
    import spark.implicits._
    // points 0, 10, 4 on a line (padded to 2 dims): seed = min id
    // (value 0), then 10 (d²=100), then 4 (min(16, 36) = 16)
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(10f, 0f)), (3L, Array(4f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Coreset.kCenter(df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    got.toSeq shouldBe Seq((1, 1L, 0.0), (2, 2L, 100.0), (3, 3L, 16.0))
  }

  it should "produce non-increasing radii (the greedy invariant)" in {
    val radii = Coreset.kCenter(emb, "vec_id", "embedding", 6)
      .orderBy(col("sel_rank")).collect().map(_.getDouble(2)).drop(1)
    radii.zip(radii.tail).foreach { case (a, b) => b should be <= a }
    radii.head should be > 0.0
  }

  it should "select an identical coreset under repartitioning" in {
    val a = Coreset.kCenter(emb, "vec_id", "embedding", 5)
      .collect().map(_.toSeq)
    val b = Coreset.kCenter(emb.repartition(7), "vec_id", "embedding", 5)
      .collect().map(_.toSeq)
    b.toSeq shouldBe a.toSeq
  }

  it should "assign every point once with the farthest equal to the next radius" in {
    val k = 5
    val assign = Coreset.kCenterAssign(emb, "vec_id", "embedding", k)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assign.map(_._3).sum shouldBe emb.count()
    assign.length shouldBe k // every center covers at least itself
    // the realized farthest point IS what greedy would select next:
    // its distance equals the (k+1)-th center's radius
    val next = Coreset.kCenter(emb, "vec_id", "embedding", k + 1)
      .filter(col("sel_rank") === k + 1).head().getDouble(2)
    assign.map(_._4).max shouldBe next +- 1e-12
  }

  it should "select distinct ids seeded by the minimum id" in {
    val rows = Coreset.kCenter(emb, "vec_id", "embedding", 6).collect()
    val ids = rows.map(_.getLong(1))
    ids.distinct.length shouldBe ids.length
    ids.head shouldBe emb.agg(min(col("vec_id"))).head().getLong(0)
  }

  behavior of "Coreset.mmrSelect"

  it should "trade relevance against redundancy on a 1-D geometry" in {
    import spark.implicits._
    // probe = min id (value 0); candidates at 1, 5, 6.
    // r1: most relevant → id 2 (d2q = 1).
    // r2: score = mind − d2q: id3 = 16 − 25 = −9 beats id4 = 25 − 36
    //     = −11 even though id4 is farther from the pick — MMR charges
    //     it for being LESS RELEVANT.
    // r3: id4 (rel 36, gain = min(25, 1) = 1).
    val df = Seq(
      (1L, Array(0f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(5f, 0f)), (4L, Array(6f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Coreset.mmrSelect(df, "vec_id", "embedding", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    got.toSeq shouldBe Seq(
      (1, 2L, 1.0, 0.0), (2, 3L, 25.0, 16.0), (3, 4L, 36.0, 1.0))
  }

  it should "select an identical MMR set under repartitioning" in {
    val a = Coreset.mmrSelect(emb, "vec_id", "embedding", 5)
      .collect().map(_.toSeq)
    val b = Coreset.mmrSelect(emb.repartition(7), "vec_id", "embedding", 5)
      .collect().map(_.toSeq)
    b.toSeq shouldBe a.toSeq
  }

  it should "never re-pick and never pick the probe" in {
    val probe = emb.agg(min(col("vec_id"))).head().getLong(0)
    val rows = Coreset.mmrSelect(emb, "vec_id", "embedding", 6).collect()
    val ids = rows.map(_.getLong(1))
    ids.distinct.length shouldBe ids.length
    ids should not contain probe
    rows.map(_.getInt(0)).toSeq shouldBe (1 to 6)
    // the seed is the global most-relevant candidate
    rows.head.getDouble(2) shouldBe rows.map(_.getDouble(2)).min
  }
}
