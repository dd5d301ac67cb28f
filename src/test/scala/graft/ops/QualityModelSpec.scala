package graft.ops

import java.math.{BigDecimal => JBD}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained-quality-classifier contracts beyond the oracle replay: the
  * census is partitioning-proof and equals a driver-side brute-force
  * over collected rows, training is bit-deterministic, the K-step
  * iterate actually descends the ridge objective, and the distributed
  * scorer agrees with a driver-side exact-decimal dot. */
class QualityModelSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  it should "produce an identical census under repartitioning" in {
    val f = QualityModel.features(docs)
    val (a1, b1, n1) = QualityModel.census(f)
    val (a2, b2, n2) = QualityModel.census(f.repartition(7))
    n1 shouldBe n2
    a1.keySet shouldBe a2.keySet
    a1.foreach { case (k, s) => s.compareTo(a2(k)) shouldBe 0 }
    b1.foreach { case (k, s) => s.compareTo(b2(k)) shouldBe 0 }
  }

  it should "census exactly the brute-force sums over collected rows" in {
    val f = QualityModel.features(docs)
    val rows = f.collect()
    def dec(r: org.apache.spark.sql.Row, c: String): JBD =
      r.getDecimal(r.fieldIndex(c))
    val (sij, bi, n) = QualityModel.census(f)
    n shouldBe rows.length.toLong
    for { i <- 1 to QualityModel.Dims; j <- i to QualityModel.Dims } {
      val brute = rows.foldLeft(JBD.ZERO)((acc, r) =>
        acc.add(dec(r, s"x$i").multiply(dec(r, s"x$j"))))
      brute.compareTo(sij((i, j))) shouldBe 0
    }
    for (i <- 1 to QualityModel.Dims) {
      val brute = rows.foldLeft(JBD.ZERO)((acc, r) =>
        acc.add(dec(r, s"x$i").multiply(dec(r, "y"))))
      brute.compareTo(bi(i)) shouldBe 0
    }
  }

  it should "train deterministically and descend the ridge objective" in {
    val f = QualityModel.features(docs)
    val (sij, bi, n) = QualityModel.census(f)
    val w1 = QualityModel.train(sij, bi, n)
    val w2 = QualityModel.train(sij, bi, n)
    w1.map(_.toPlainString).toSeq shouldBe w2.map(_.toPlainString).toSeq
    // gradient-norm floor: after K steps the iterate must be far
    // closer to stationarity than the first step was (the exact
    // optimum is unreachable on the decimal grid, so compare norms)
    def gradNorm(w: Array[JBD]): Double = {
      val lam = new JBD(QualityModel.Lambda)
      val d = QualityModel.Dims
      (1 to d).map { i =>
        var g = 0.0
        for (j <- 1 to d) {
          val s = sij(if (i <= j) (i, j) else (j, i)).doubleValue / n
          val aij = s + (if (i == j) lam.doubleValue else 0.0)
          g += aij * w(j - 1).doubleValue
        }
        math.abs(g - bi(i).doubleValue / n)
      }.max
    }
    val g0 = gradNorm(Array.fill(QualityModel.Dims)(JBD.ZERO))
    val gK = gradNorm(w1)
    gK should be < g0 / 10
  }

  it should "score distributively exactly as the driver decimal dot" in {
    val f = QualityModel.features(docs)
    val (sij, bi, n) = QualityModel.census(f)
    val w = QualityModel.train(sij, bi, n)
    val scored = QualityModel.scoredFrame(docs)
      .select("doc_id", "score", "keep", "agree").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getBoolean(2)))).toMap
    val half = new JBD("0.5").setScale(9)
    QualityModel.features(docs).collect().foreach { r =>
      var dot = JBD.ZERO
      for (i <- 1 to QualityModel.Dims)
        dot = dot.add(r.getDecimal(r.fieldIndex(s"x$i")).multiply(w(i - 1)))
      val (score, keep) = scored(r.getLong(0))
      score shouldBe dot.doubleValue
      keep shouldBe (dot.compareTo(half) >= 0)
    }
  }

  it should "score identically from the persisted model artifact" in {
    val base = freshDir("qm-model-roundtrip")
    QualityModel.writeModel(spark, docs, base)
    val w = QualityModel.loadWeights(spark, base)
    val f = QualityModel.features(docs)
    val (sij, bi, n) = QualityModel.census(f)
    val trained = QualityModel.train(sij, bi, n)
    // the parquet doubles must re-grid to the exact trained decimals
    w.zip(trained).foreach { case (a, b) => a.compareTo(b) shouldBe 0 }
    val direct = QualityModel.scoredFrame(docs).collect().map(_.toSeq)
    val indexed = QualityModel.scoredFrameIndexed(docs, base)
      .collect().map(_.toSeq)
    indexed.toSeq shouldBe direct.toSeq
  }

  it should "append a batch bit-identically to a one-shot build" in {
    val oneShot = freshDir("qm-model-oneshot")
    val incr = freshDir("qm-model-incr")
    QualityModel.writeModel(spark, docs, oneShot)
    QualityModel.writeModel(spark, docs.filter(col("doc_id") % 2 === 0), incr)
    QualityModel.appendModel(docs.filter(col("doc_id") % 2 =!= 0), incr)
    val a = QualityModel.loadWeights(spark, oneShot)
    val b = QualityModel.loadWeights(spark, incr)
    a.zip(b).foreach { case (x, y) => x.compareTo(y) shouldBe 0 }
  }

  it should "recover a mid-swap aside before reading" in {
    val base = freshDir("qm-model-aside")
    QualityModel.writeModel(spark, docs, base)
    val w = QualityModel.loadWeights(spark, base)
    // simulate a crash between replaceDir's two renames: the live
    // tree is parked at .old and the destination is missing
    val f = new java.io.File(base)
    val aside = new java.io.File(base + ".old")
    assert(f.renameTo(aside))
    val recovered = QualityModel.loadWeights(spark, base)
    recovered.zip(w).foreach { case (x, y) => x.compareTo(y) shouldBe 0 }
  }

  it should "beat the keep-all base rate on the weak labels" in {
    val agg = QualityModel.scoredFrame(docs)
      .agg(avg(col("agree").cast("double")).as("acc"),
        avg(col("label").cast("double")).as("pos")).head()
    val (acc, pos) = (agg.getDouble(0), agg.getDouble(1))
    val baseRate = math.max(pos, 1 - pos) // majority-class accuracy
    acc should be > baseRate
  }
}
