package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic randomized property tests for the sketch aggregators
  * (fixed seeds, same offline-friendly pattern as
  * graft.ops.RandomizedPropertySpec), plus FALSIFIABILITY checks: the
  * gate invariants must be able to go false on deliberately broken
  * inputs — an invariant that can't fail verifies nothing. */
class SketchPropertySpec extends SparkSpec {

  /** Random stream: Zipf-ish heavy head over a random-size tail. */
  private def randomStream(seed: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    val heads = 1 + rng.nextInt(10)
    val hot = (0 until heads).flatMap(i =>
      Seq.fill(200 + rng.nextInt(3000) / (i + 1))(s"h${seed}_$i"))
    val tail = (0 until 500 + rng.nextInt(4000)).map(i => s"t${seed}_$i")
    rng.shuffle(hot ++ tail)
  }

  "MisraGries + CountMin" should "hold their guarantees on random skewed streams" in {
    import spark.implicits._
    val width = 256; val depth = 4
    for (seed <- Seq(7, 42, 99)) {
      val items = randomStream(seed)
      val n = items.size
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val k = 8 + seed % 13
      val row = items.toDF("t").repartition(1 + seed % 7)
        .agg(MisraGries.heavyHitters(k)(col("t")).as("mg"),
          CountMin.sketch(width, depth)(col("t")).as("cm"))
        .collect()(0)
      val mg = row.getMap[String, Long](0).toMap
      val cm = row.getSeq[Long](1).toArray

      mg.size should be <= (k - 1)
      exact.filter(_._2 > n.toDouble / k).keySet.foreach { t =>
        withClue(s"seed $seed MG must keep $t: ") { mg.keySet should contain(t) }
      }
      mg.foreach { case (t, est) =>
        est should be <= exact(t)
        (exact(t) - est).toDouble should be <= n.toDouble / k
      }
      exact.foreach { case (t, c) =>
        val est = CountMin.estimate(cm, t, width, depth)
        withClue(s"seed $seed CM under-counted $t: ") { est should be >= c }
      }
    }
  }

  "the sketch gate invariants" should "fail on deliberately broken sketches" in {
    val items = randomStream(5)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    val k = 16
    val hot = exact.filter(_._2 > n.toDouble / k).keySet
    hot should not be empty
    // a sketch that dropped a guaranteed heavy hitter → in_sketch false
    val broken = hot.take(1).foldLeft(exact.filter(_._2 > 50)) { (m, t) => m - t }
    hot.exists(t => !broken.contains(t)) shouldBe true
    // a counter that under-counts → the count-min lower-bound check fails
    val width = 256; val depth = 4
    val cm = new CountMinAggregator(width, depth)
    val sk = items.foldLeft(cm.zero)(cm.reduce)
    val t0 = hot.head
    val cell0 = depth - 1
    val idx = cell0 * width + CountMin.cell(t0, cell0, width)
    val tampered = sk.clone()
    tampered(idx) = math.max(0L, exact(t0) / 2 - 1)
    CountMin.estimate(tampered, t0, width, depth) should be < exact(t0)
  }

  "the hamming-pair gate comparison" should "flag a dropped or distance-shifted pair" in {
    import spark.implicits._
    import graft.ops.Dedup
    // small signature corpus with a known hamming-ball structure
    val sigs = Seq(
      (1L, 0x0F0FL), (2L, 0x0F0EL), (3L, 0x0F0CL),
      (4L, 0x7777123456789ABCL)).toDF("doc_id", "simhash")
    val full = Dedup.hammingNearDups(sigs, "doc_id", "simhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    full should contain((1L, 2L, 1))
    // simulate a broken miner: maxHamming = 1 misses the distance-2/3
    // pairs the brute ball at 3 contains — exactly what the
    // q_dedup_simhash_pairs edge comparison must catch
    val narrowed = Dedup.hammingNearDups(sigs, "doc_id", "simhash", maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    narrowed should not equal full
    (full -- narrowed).foreach { case (a, b, h) => h should be > 1 }
  }
}
