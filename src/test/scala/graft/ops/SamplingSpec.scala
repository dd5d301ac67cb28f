package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // 400 'a' rows, 100 'b' rows — 'a' is over-represented vs an equal
    // 50/50 target, 'b' under-represented (cap branch)
    (0L until 400L).map(i => (i, "a")) ++ (400L until 500L).map(i => (i, "b"))
  }

  "mixtureResample" should "thin over-represented strata toward the target and cap the rest" in {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "stratum")
    val kept = Sampling.mixtureResample(df, "stratum", "doc_id",
      Map("a" -> (1, 2), "b" -> (1, 2)))
    val byStratum = kept.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'b': target 250 > available 100 → keep all
    byStratum("b") shouldBe 100L
    // 'a': keep fraction 250/400 quantized to 1/65536 — md5 prefixes are
    // ~uniform, so kept count lands near 250 (binomial, sd ≈ 9.7)
    byStratum("a") should be >= 200L
    byStratum("a") should be <= 300L
  }

  it should "be a pure function of the id (stable under repartitioning)" in {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "stratum")
    val t = Map("a" -> (1, 3), "b" -> (2, 3))
    val k1 = Sampling.mixtureResample(df, "stratum", "doc_id", t)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val k2 = Sampling.mixtureResample(df.repartition(7, col("doc_id")),
        "stratum", "doc_id", t)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    k1 shouldBe k2
    k1.nonEmpty shouldBe true
  }

  it should "drop strata absent from the target map and reject bad weights" in {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "stratum")
    Sampling.mixtureResample(df, "stratum", "doc_id", Map("a" -> (1, 1)))
      .select("stratum").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("a")
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixtureResample(df, "stratum", "doc_id", Map("a" -> (1, 0)))
  }

  "epochRepeats" should "match the exact base/tail arithmetic and track targets" in {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "stratum")
    // a: 400/500 rows at target 3/4 of 500 = 375 → base 0, tail 15/16;
    // b: 100 rows at target 3/1 of 500 = 1500 → base 15 (multi-epoch)
    val t = Map("a" -> (3, 4), "b" -> (3, 1))
    val planned = Sampling.epochRepeats(df, "stratum", "doc_id", t).cache()
    // exact reference: replicate the BigInt plan per stratum
    val counts = Map("a" -> 400L, "b" -> 100L)
    val total = 500L
    counts.foreach { case (s, cnt) =>
      val (num, den) = t(s)
      val tgt = BigInt(num) * total
      val denom = BigInt(den) * cnt
      val base = (tgt / denom).toLong
      val tailHex = f"${(((tgt - base * denom) * 65536) / denom).toLong}%04x"
      val rows = planned.filter(col("stratum") === s)
        .select("doc_id", "n_copies").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.size shouldBe cnt
      rows.foreach { case (id, c) =>
        val md5p = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 4)
        c shouldBe (base + (if (md5p < tailHex) 1L else 0L))
      }
      // Σ copies tracks the target within the quantization bound
      val sum = rows.values.sum
      math.abs(sum - (tgt / BigInt(den)).toLong) should be <= (cnt / 65536 + 2)
    }
    // absent strata drop; stability under repartitioning
    val again = Sampling.epochRepeats(df.repartition(13), "stratum", "doc_id", t)
    again.exceptAll(planned).count() shouldBe 0
    Sampling.epochRepeats(df, "stratum", "doc_id", Map("b" -> (1, 1)))
      .select("stratum").distinct().collect()
      .map(_.getString(0)).toSeq shouldBe Seq("b")
  }

  "temperatureRepeats" should "allocate shares proportional to isqrt(count) over the same total" in {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "stratum")
    // weights: ⌊√400⌋ = 20, ⌊√100⌋ = 10 → a gets 2/3·500, b 1/3·500 —
    // equivalent to epochRepeats with those exact rational targets
    val t = Sampling.temperatureRepeats(df, "stratum", "doc_id")
    val e = Sampling.epochRepeats(df, "stratum", "doc_id",
      Map("a" -> (20, 30), "b" -> (10, 30)))
    t.exceptAll(e).count() shouldBe 0
    e.exceptAll(t).count() shouldBe 0
    val sums = t.groupBy("stratum").agg(sum("n_copies").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets 333⅓ / 166⅔, quantization bound cnt/65536 + 1
    math.abs(sums("a") - 333L) should be <= 2L
    math.abs(sums("b") - 167L) should be <= 2L
    // the dominant stratum thins below its own count contribution is
    // NOT required here (400 > 333 → some zero-copy docs exist)
    t.filter(col("stratum") === "a" && col("n_copies") === 0L)
      .count() should be > 0L
  }

  "selectByBudget" should "keep exactly the best-scored prefix that fits the budget" in {
    import spark.implicits._
    // score = doc_id % 7 (ties galore), tok = 10 + doc_id % 13
    val df = (0L until 500L)
      .map(i => (i, i % 7, 10L + i % 13)).toDF("doc_id", "score", "tok")
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
    val budget = rows.map(_._3).sum / 3
    // single-threaded reference: maximal prefix with cumsum ≤ budget
    var cum = 0L
    val expect = rows.takeWhile { case (_, _, tok) => cum += tok; cum <= budget }
      .map { case (id, _, _) => id }.toSet
    val got = Sampling.selectByBudget(df, "doc_id", "score", "tok", budget)
    val gotIds = got.select("doc_id").collect().map(_.getLong(0)).toSet
    gotIds shouldBe expect
    // cum_tokens is the GLOBAL running sum: max equals the reference's
    got.agg(max("cum_tokens")).head().getLong(0) shouldBe
      rows.take(expect.size).map(_._3).sum
    // partition-invariant: same kept set from a different layout
    val again = Sampling.selectByBudget(
      df.repartition(11, col("tok")), "doc_id", "score", "tok", budget)
    again.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe expect
  }
}
