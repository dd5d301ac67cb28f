package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft.ops.RandomProjection — pure-hash ±1 JL projection. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { id =>
      id -> Array.tabulate(RandomProjection.Dims) { d =>
        (((id * 31 + d * 17) % 13).toInt - 6) / 4.0f
      }
    }

  behavior of "RandomProjection.project"

  it should "match a hand-computed exact projection" in {
    val data = vecs(5)
    val out = RandomProjection.project(
        data.toDF("vec_id", "embedding"), "embedding", "vec_id", r = 4)
      .orderBy(col("vec_id")).collect()
    val byId = data.toMap
    out.foreach { row =>
      val x = byId(row.getLong(0))
      (0 until 4).foreach { j =>
        // the quarter-grid inputs are exact in both float and decimal,
        // so the expected value is a plain BigDecimal sum
        val expect = (0 until RandomProjection.Dims).map { i =>
          BigDecimal(x(i).toDouble) * RandomProjection.sign(i, j)
        }.sum.toDouble
        row.getDouble(j + 1) shouldBe expect
      }
    }
  }

  it should "be invariant under repartitioning" in {
    val df = vecs(40).toDF("vec_id", "embedding")
    val a = RandomProjection.project(df, "embedding", "vec_id")
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    val b = RandomProjection.project(df.repartition(7), "embedding", "vec_id")
      .orderBy(col("vec_id")).collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  it should "draw a balanced sign matrix" in {
    val signs = for (i <- 0 until RandomProjection.Dims; j <- 0 until 16)
      yield RandomProjection.sign(i, j)
    val plus = signs.count(_ == 1)
    // 1024 fair draws: ± 3σ ≈ ±48 around 512
    plus should be > 464
    plus should be < 560
  }

  it should "preserve pairwise squared distances within the JL band" in {
    val data = vecs(30)
    val proj = RandomProjection.project(
        data.toDF("vec_id", "embedding"), "embedding", "vec_id")
      .orderBy(col("vec_id")).collect()
      .map(r => r.getLong(0) -> (1 to RandomProjection.OutDims)
        .map(r.getDouble).toArray).toMap
    val r = RandomProjection.OutDims.toDouble
    val ratios = (for {
      (ida, xa) <- data; (idb, xb) <- data if ida < idb
      d2 = xa.zip(xb).map { case (p, q) => (p - q) * (p - q) }.sum.toDouble
      // the id-mod-13 generator repeats vectors — identical pairs
      // carry no distance to preserve
      if d2 > 0
    } yield {
      val pa = proj(ida); val pb = proj(idb)
      // E[||Pa-Pb||²] = r·||a-b||², so the scaled ratio centers on 1
      pa.zip(pb).map { case (p, q) => (p - q) * (p - q) }.sum / (r * d2)
    })
    ratios.size should be > 300
    val mean = ratios.sum / ratios.size
    mean should be > 0.6
    mean should be < 1.4
    // deterministic draw → record the realized concentration too
    ratios.count(x => x > 0.2 && x < 2.5).toDouble / ratios.size should be > 0.9
  }
}
