package graft.ops

import java.math.{BigDecimal => JBD}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA contracts beyond the oracle replay: the converged direction is
  * a genuine eigenvector (small matvec residual), the census is
  * partitioning-proof, and the distributed projection equals the
  * driver-side exact dot. */
class PcaSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  it should "converge to an eigenvector of the exact covariance" in {
    val (sij, si, n) = Pca.momentCensus(emb, "embedding")
    val cov = Pca.covariance(sij, si, n)
    val (v, lambda) = Pca.powerIteration(cov)
    // residual of the ∞-normalized eigen equation: C v ≈ λ v
    val vd = v.map(_.doubleValue)
    val w = Array.tabulate(Pca.Dims) { i =>
      (1 to Pca.Dims).map(j => cov((i + 1, j)).doubleValue * vd(j - 1)).sum
    }
    val resid = w.zip(vd).map { case (wi, vi) => math.abs(wi - lambda * vi) }.max
    lambda should be > 0.0
    // the synthetic embeddings are NEAR-ISOTROPIC (small eigengap), so
    // K=8 converges slowly here — the gate's guarantee is exact
    // cross-engine REPRODUCIBILITY of the iterate, and this bound is a
    // direction-sanity floor (measured 0.07·λ at sf0.001; a spiked
    // production spectrum converges far tighter at the same K)
    resid should be < 0.1 * lambda
    vd.map(math.abs).max shouldBe 1.0 +- 1e-9 // ∞-normalized
  }

  it should "produce an identical census under repartitioning" in {
    val (a1, b1, n1) = Pca.momentCensus(emb, "embedding")
    val (a2, b2, n2) = Pca.momentCensus(emb.repartition(7), "embedding")
    n1 shouldBe n2
    a1.keySet shouldBe a2.keySet
    a1.foreach { case (k, s) => s.compareTo(a2(k)) shouldBe 0 }
    b1.foreach { case (k, s) => s.compareTo(b2(k)) shouldBe 0 }
  }

  it should "compute the kernel census bit-equal to the declarative twin" in {
    val (ka, kb, kn) = Pca.momentCensus(emb, "embedding")
    val (da, db, dn) = Pca.momentCensusDeclarative(emb, "embedding")
    kn shouldBe dn
    ka.keySet shouldBe da.keySet
    ka.foreach { case (k, s) => s.compareTo(da(k)) shouldBe 0 }
    kb.foreach { case (k, s) => s.compareTo(db(k)) shouldBe 0 }
  }

  it should "project distributively exactly as the driver dot" in {
    val (sij, si, n) = Pca.momentCensus(emb, "embedding")
    val (v, _) = Pca.powerIteration(Pca.covariance(sij, si, n))
    val distributed = Pca.project(emb, "embedding", "vec_id", v)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver replay on a sample of vectors: quantize each element to
    // the (12,9) grid exactly as the operator does, exact JBD dot
    val sample = emb.orderBy("vec_id").limit(20).collect()
    sample.foreach { row =>
      val id = row.getLong(row.fieldIndex("vec_id"))
      val xs = row.getSeq[Float](row.fieldIndex("embedding"))
      val dot = xs.zip(v).foldLeft(JBD.ZERO) { case (acc, (x, vi)) =>
        acc.add(new JBD(java.lang.Double.toString(x.toDouble))
          .setScale(9, java.math.RoundingMode.HALF_UP).multiply(vi))
      }
      distributed(id) shouldBe dot.doubleValue
    }
  }
}
