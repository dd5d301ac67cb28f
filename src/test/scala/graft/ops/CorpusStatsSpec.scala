package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  "CorpusStats.overlapBottomK" should "be exact when the sketch covers the universe" in {
    val a = (1 to 6).map(i => s"doc text $i").toDF("text")
    val b = (4 to 9).map(i => s"doc text $i").toDF("text")
    val r = CorpusStats.overlapBottomK(a, b, "text", k = 16).head()
    r.getAs[Long]("n_a") shouldBe 6L
    r.getAs[Long]("n_b") shouldBe 6L
    r.getAs[Long]("n_inter") shouldBe 3L
    r.getAs[Long]("n_union") shouldBe 9L
    // k >= |A ∪ B|: the sketch IS the universe, estimate = exact
    r.getAs[Long]("union_k") shouldBe 9L
    r.getAs[Long]("inter_k") shouldBe 3L
    r.getAs[Double]("j_est") shouldBe r.getAs[Double]("j_exact")
    r.getAs[Double]("j_exact") shouldBe (3.0 / 9.0)
  }

  it should "estimate within the KMV error band and ignore partitioning" in {
    val a = (1 to 200).map(i => s"shared $i").toDF("text")
    val b = ((101 to 200).map(i => s"shared $i") ++
      (1 to 100).map(i => s"only b $i")).toDF("text")
    val r1 = CorpusStats.overlapBottomK(a, b, "text", k = 64).head()
    val r2 = CorpusStats.overlapBottomK(
      a.repartition(7), b.repartition(3), "text", k = 64).head()
    r1.toSeq shouldBe r2.toSeq // md5 bottom-k is partitioning-proof
    val est = r1.getAs[Double]("j_est")
    val exact = r1.getAs[Double]("j_exact")
    exact shouldBe (100.0 / 300.0)
    // standard KMV error ~ 1/sqrt(k) = 0.125; allow 3 sigma
    math.abs(est - exact) should be < 0.375
  }

  it should "report duplicate-free epochs as disjoint" in {
    val a = (1 to 5).map(i => s"left $i").toDF("text")
    val b = (1 to 5).map(i => s"right $i").toDF("text")
    val r = CorpusStats.overlapBottomK(a, b, "text", k = 8).head()
    r.getAs[Long]("inter_k") shouldBe 0L
    r.getAs[Double]("j_exact") shouldBe 0.0
    r.getAs[Double]("j_est") shouldBe 0.0
  }

  "CorpusStats.psi" should "be exactly zero between identical distributions" in {
    val vals = (1 to 100) ++ (1 to 100)
    val df = vals.zipWithIndex
      .map { case (v, i) => (v.toLong, i < 100) }.toDF("v", "in_a")
    val rows = CorpusStats.psi(df, col("v"), col("in_a"), buckets = 10).collect()
    rows.length shouldBe 11
    // identical counts per bucket -> ln(1) = 0 -> every term exactly 0
    rows.foreach(_.getAs[Double]("psi_term") shouldBe 0.0)
    val total = rows.find(_.getAs[Long]("bucket") == -1L).get
    total.getAs[Long]("c_a") shouldBe 100L
    total.getAs[Long]("c_b") shouldBe 100L
  }

  it should "bucket correctly when (v - min)·B overflows 64-bit (widened arithmetic)" in {
    // envelope ±4.6e18: (v − mn)·10 reaches ~9.2e19, past Long.MaxValue —
    // the pre-r14 BIGINT expression wrapped here (and DuckDB would
    // error, so the engines diverged). DECIMAL(38,0) stays exact.
    val half = Long.MaxValue / 2
    val vals = Seq(-half, -half / 2, -1L, 0L, 1L, half / 2, half)
    val df = (vals.map((_, true)) ++ vals.map((_, false))).toDF("v", "in_a")
    val got = CorpusStats.psi(df, col("v"), col("in_a"), buckets = 10)
      .filter(col("bucket") >= 0).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("c_a")).toMap
    // BigInt reference of the same formula
    val (mn, mx) = (BigInt(-half), BigInt(half))
    val ref = vals.groupBy(v => ((BigInt(v) - mn) * 10 / (mx - mn + 1)).toLong)
      .map { case (b, vs) => b -> vs.length.toLong }
    got.filter(_._2 > 0) shouldBe ref
    got.keys.foreach { b => b should (be >= 0L and be < 10L) }
    // pinned-envelope census: same widened math under explicit bounds
    val pinned = CorpusStats.psiCensusPinned(df, col("v"), col("in_a"),
        buckets = 10, mn = -half, mx = half)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("c_a")).toMap
    pinned.filter(_._2 > 0) shouldBe ref
  }

  it should "flag a shifted distribution with nonnegative terms summing to the total" in {
    val df = ((1 to 100).map(v => (v.toLong, true)) ++
      (51 to 150).map(v => (v.toLong, false))).toDF("v", "in_a")
    val rows = CorpusStats.psi(df, col("v"), col("in_a"), buckets = 10).collect()
    val terms = rows.filter(_.getAs[Long]("bucket") >= 0L)
    terms.length shouldBe 10
    // (p-q) and ln(p/q) always share a sign: every PSI term >= 0
    terms.foreach(_.getAs[Double]("psi_term") should be >= 0.0)
    val total = rows.find(_.getAs[Long]("bucket") == -1L).get
      .getAs[Double]("psi_term")
    total should be > 0.2 // a 50% shift is far past the 0.2 alert line
    // the total row is the exact decimal sum of the quantized terms
    val summed = terms.map(r => BigDecimal(r.getAs[Double]("psi_term")))
      .sum.toDouble
    total shouldBe summed +- 1e-12
  }

  it should "be bit-identical under repartitioning" in {
    val df = ((1 to 100).map(v => (v.toLong, true)) ++
      (31 to 130).map(v => (v.toLong, false))).toDF("v", "in_a")
    val r1 = CorpusStats.psi(df.repartition(1), col("v"), col("in_a")).collect()
    val r2 = CorpusStats.psi(df.repartition(13), col("v"), col("in_a")).collect()
    r1.map(_.toSeq).toSeq shouldBe r2.map(_.toSeq).toSeq
  }

  "CorpusStats.mergeSketches" should "be associative: merged halves equal the joint sketch" in {
    val a1 = (1 to 60).map(i => s"text $i").toDF("text")
    val a2 = (41 to 120).map(i => s"text $i").toDF("text")
    val joint = CorpusStats.sketchBottomK(a1.unionByName(a2), "text", k = 16)
      .collect().map(_.getString(0)).toSeq
    val merged = CorpusStats.mergeSketches(
      CorpusStats.sketchBottomK(a1, "text", 16),
      CorpusStats.sketchBottomK(a2, "text", 16), 16)
      .collect().map(_.getString(0)).toSeq
    merged.sorted shouldBe joint.sorted
  }

  it should "serve the overlap estimate from persisted sketches alone" in {
    val dir = freshDir("sketch-artifact")
    val a = (1 to 50).map(i => s"left $i").toDF("text")
    val b = ((26 to 50).map(i => s"left $i") ++
      (1 to 25).map(i => s"right $i")).toDF("text")
    CorpusStats.writeSketch(a, "text", 32, s"$dir/a")
    CorpusStats.writeSketch(b, "text", 32, s"$dir/b")
    val served = CorpusStats.overlapFromSketches(
      CorpusStats.readSketch(spark, s"$dir/a"),
      CorpusStats.readSketch(spark, s"$dir/b"), 32).head()
    val direct = CorpusStats.overlapBottomK(a, b, "text", 32).head()
    served.getAs[Long]("union_k") shouldBe direct.getAs[Long]("union_k")
    served.getAs[Long]("inter_k") shouldBe direct.getAs[Long]("inter_k")
    served.getAs[Double]("j_est") shouldBe direct.getAs[Double]("j_est")
  }

  "CorpusStats.driftFromPartials" should "make the batch split and replays value-invisible" in {
    val dir = freshDir("drift-partials")
    val df = ((1 to 100).map(v => (v.toLong, true)) ++
      (31 to 130).map(v => (v.toLong, false))).toDF("v", "in_a")
    val oneShot = CorpusStats.psi(df, col("v"), col("in_a")).collect()
      .map(_.toSeq).toSeq
    CorpusStats.writeDriftMeta(spark, dir, 1L, 130L, 10)
    // 3-way mod split + a deliberate replay of batch 2
    (0 to 2).foreach { i =>
      val part = df.filter(pmod(col("v"), lit(3)) === i)
      CorpusStats.writeDriftPartial(
        CorpusStats.psiCensusPinned(part, col("v"), col("in_a"), 10, 1L, 130L),
        dir, i.toLong)
    }
    CorpusStats.writeDriftPartial(
      CorpusStats.psiCensusPinned(df.filter(pmod(col("v"), lit(3)) === 2),
        col("v"), col("in_a"), 10, 1L, 130L), dir, 2L)
    val folded = CorpusStats.driftFromPartials(spark, dir).collect()
      .map(_.toSeq).toSeq
    folded shouldBe oneShot
  }

  "CorpusStats.psiCensusPinned" should "clamp out-of-envelope values into the edge bins" in {
    val df = Seq((-5L, true), (0L, true), (99L, false), (500L, false))
      .toDF("v", "in_a")
    val rows = CorpusStats.psiCensusPinned(df, col("v"), col("in_a"), 10, 0L, 99L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows(0L) shouldBe ((2L, 0L)) // -5 clamps up into bucket 0
    rows(9L) shouldBe ((0L, 2L)) // 500 clamps down into bucket 9
  }

  "Dedup.noveltyScores" should "score copied, fresh, partial, and short candidates" in {
    val ref = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, "a b c d e f"),     // fully covered -> novelty 0
      (2L, "p q r s t"),       // nothing shared -> novelty 1
      (3L, "a b c d x y z w"), // 5 4-grams, 1 covered -> 0.8
      (4L, "a b")              // < 4 tokens -> 0 n-grams, novelty 0
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(cands, ref, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    out(1L) shouldBe ((3L, 0L, 0.0))
    out(2L) shouldBe ((2L, 2L, 1.0))
    out(3L) shouldBe ((5L, 4L, 0.8))
    out(4L) shouldBe ((0L, 0L, 0.0))
  }

  "DocStreams.driftIngest" should "land additive partials whose fold equals the one-shot PSI" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = freshDir("drift-ingest")
    val valsA = (1 to 100).map(v => (v.toLong, true))
    val valsB = (41 to 140).map(v => (v.toLong, false))
    val df = (valsA ++ valsB).toDF("v", "in_a")
    val oneShot = CorpusStats.psi(df, col("v"), col("in_a")).collect()
      .map(_.toSeq).toSeq
    CorpusStats.writeDriftMeta(spark, dir, 1L, 140L, 10)
    val mem = MemoryStream[(Long, Boolean)]
    val q = graft.streaming.DocStreams.driftIngest(
      mem.toDF().toDF("v", "in_a"), dir, "v", "in_a", 10, 1L, 140L)
    mem.addData(valsA.map { case (v, a) => (v, a) }: _*)
    q.processAllAvailable()
    mem.addData(valsB: _*)
    q.processAllAvailable()
    q.stop()
    val folded = CorpusStats.driftFromPartials(spark, dir).collect()
      .map(_.toSeq).toSeq
    folded shouldBe oneShot
  }

  "CorpusStats.overlapBottomK" should "match Scala set arithmetic on random corpora" in {
    val rng = new scala.util.Random(77)
    (1 to 3).foreach { _ =>
      val univ = (1 to 150).map(i => s"doc word $i")
      val a = univ.filter(_ => rng.nextBoolean())
      val b = univ.filter(_ => rng.nextBoolean())
      val r = CorpusStats.overlapBottomK(
        a.toDF("text"), b.toDF("text"), "text", k = 200).head()
      val (sa, sb) = (a.toSet, b.toSet)
      r.getAs[Long]("n_a") shouldBe sa.size.toLong
      r.getAs[Long]("n_b") shouldBe sb.size.toLong
      r.getAs[Long]("n_inter") shouldBe (sa & sb).size.toLong
      r.getAs[Long]("n_union") shouldBe (sa | sb).size.toLong
      // k >= |A ∪ B| -> the sketch is exact
      r.getAs[Double]("j_est") shouldBe r.getAs[Double]("j_exact")
    }
  }

  "Dedup.noveltyScores" should "stay in [0,1] and never rise as the reference grows" in {
    val rng = new scala.util.Random(99)
    val vocab = (1 to 40).map(i => s"w$i")
    def randDoc(id: Long) =
      (id, (1 to (4 + rng.nextInt(9))).map(_ => vocab(rng.nextInt(vocab.length)))
        .mkString(" "))
    val cands = (1L to 30L).map(randDoc).toDF("doc_id", "text")
    val ref1 = (101L to 120L).map(randDoc)
    val ref2 = ref1 ++ (121L to 140L).map(randDoc)
    def novMap(ref: Seq[(Long, String)]) =
      Dedup.noveltyScores(cands, ref.toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("n_ngrams"), r.getAs[Double]("novelty"))).toMap
    val (m1, m2) = (novMap(ref1), novMap(ref2))
    m1.keySet shouldBe m2.keySet
    m1.foreach { case (id, (n1, nov1)) =>
      val (n2, nov2) = m2(id)
      n2 shouldBe n1 // the candidate's own n-gram census is fixed
      nov1 should (be >= 0.0 and be <= 1.0)
      nov2 should be <= nov1 // a larger reference can only cover more
    }
  }

  "TextQueries.leakageSplit" should "keep near-dup clusters atomic across splits" in {
    val dir = freshDir("leakage-split-docs")
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (Seq((1L, dup), (2L, dup)) ++
      (3L to 8L).map(i => (i, s"unique words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h")))
      .map { case (id, t) => (id, t, "en", "crafted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextQueries.leakageSplit(spark, dir).collect()
    rows.foreach(_.getAs[Long]("crossing_pairs") shouldBe 0L)
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe 8L
    // docs 1+2 collapse to one cluster: 7 clusters total
    rows.map(_.getAs[Long]("n_clusters")).sum shouldBe 7L
    rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")) shouldBe true
  }
}
