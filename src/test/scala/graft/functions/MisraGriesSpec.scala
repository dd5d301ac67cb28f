package graft.functions

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Misra–Gries sketch: the n/k guarantee and two-sided estimate bound
  * on a HIGH-CARDINALITY skewed stream (vocabulary ≫ counters, so the
  * decrement/merge-shed paths genuinely fire — unlike the 31-token
  * gate corpus), plus merge-order robustness and the driver-gate
  * agreement on real documents. */
class MisraGriesSpec extends SparkSpec {

  // Zipf-ish deterministic skew: item i contributes 2000/(i+1) copies
  // of "hot_i" for i < 8, plus a long uniform tail of 3000 singletons —
  // vocabulary ≈ 3008 against k − 1 = 15 counters
  private def skewed = {
    val hot = (0 until 8).flatMap(i => Seq.fill(2000 / (i + 1))(s"hot_$i"))
    val tail = (0 until 3000).map(i => s"tail_$i")
    hot ++ tail
  }

  private def sketchOf(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    items.toDF("t").repartition(parts)
      .agg(MisraGries.heavyHitters(k)(col("t")).as("sk"))
      .collect()(0).getMap[String, Long](0).toMap
  }

  "MisraGriesAggregator" should "keep every item above n/k with a bounded estimate" in {
    val items = skewed
    val n = items.size
    val k = 16
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = sketchOf(items, k, parts = 4)
    sk.size should be <= (k - 1)
    // the guarantee: true frequency > n/k ⇒ present
    val mustKeep = exact.filter(_._2 > n.toDouble / k).keySet
    mustKeep should not be empty
    mustKeep.foreach { t => sk.keySet should contain(t) }
    // two-sided bound for every surviving counter
    sk.foreach { case (t, est) =>
      est should be <= exact(t)
      (exact(t) - est).toDouble should be <= n.toDouble / k
    }
    // shedding genuinely fired: the tail can't all be resident
    sk.size should be < exact.size
  }

  it should "honor the guarantee under every partitioning (merge-order robustness)" in {
    val items = skewed
    val n = items.size
    val k = 16
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter(_._2 > n.toDouble / k).keySet
    for (parts <- Seq(1, 3, 17)) {
      val sk = sketchOf(items, k, parts)
      mustKeep.foreach { t => sk.keySet should contain(t) }
      sk.foreach { case (t, est) =>
        est should be <= exact(t)
        (exact(t) - est).toDouble should be <= n.toDouble / k
      }
    }
  }

  it should "agree with exact counts on real documents (driver-gate shape)" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(Text.tokens(col("text"))).as("term"))
    val k = 40
    val sk = toks.agg(MisraGries.heavyHitters(k)(col("term")).as("sk"))
      .collect()(0).getMap[String, Long](0).toMap
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.filter(_._2 > n.toDouble / k).keySet.foreach { t =>
      sk.keySet should contain(t)
    }
    // the 31-token vocabulary fits the 39 counters → estimates exact
    sk.foreach { case (t, est) => est shouldBe exact(t) }
  }
}
