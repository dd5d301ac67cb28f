package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  // deterministic synthetic corpus: ids 0..n-1, token counts spread
  // 1..120 with a few oversized outliers above the 64-token budget
  private def synth(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val tok = if (i % 97 == 0) 300L + i % 7 else 1L + (i * 2654435761L % 120).abs
      (i.toLong, tok)
    }.toDF("doc_id", "toks")
  }

  private val budget = 64L
  private val buckets = 4

  "Packing.packNextFit" should "assign every doc to exactly one bin" in {
    val in = synth(500)
    val out = Packing.packNextFit(in, "doc_id", "toks", budget, buckets).cache()
    out.count() shouldBe 500
    out.select("doc_id").distinct().count() shouldBe 500
    out.agg(sum("toks")).head.getLong(0) shouldBe
      in.agg(sum("toks")).head.getLong(0)
  }

  it should "never overfill a multi-doc bin and isolate oversized docs" in {
    val out = Packing.packNextFit(synth(500), "doc_id", "toks", budget, buckets)
    val bins = out.groupBy("bin_id")
      .agg(sum("toks").as("bt"), count(lit(1)).as("bn"), max("toks").as("bmax"))
      .cache()
    bins.filter(col("bn") > 1 && col("bt") > budget).count() shouldBe 0
    bins.filter(col("bmax") > budget && col("bn") =!= 1).count() shouldBe 0
  }

  it should "route by id mod buckets and respect the next-fit bin bound" in {
    val out = Packing.packNextFit(synth(500), "doc_id", "toks", budget, buckets)
      .cache()
    out.filter(pmod(col("doc_id"), lit(buckets)) =!= col("bucket"))
      .count() shouldBe 0
    out.filter(shiftright(col("bin_id"), 32) =!= col("bucket").cast("long"))
      .count() shouldBe 0
    val binsUsed = out.select("bin_id").distinct().count()
    val total = out.agg(sum("toks")).head.getLong(0)
    binsUsed should be <= 2 * ((total + budget - 1) / budget) + 2 * buckets
  }

  it should "produce identical assignments under any input partitioning" in {
    val in = synth(300)
    val a = Packing.packNextFit(in.repartition(7), "doc_id", "toks", budget, buckets)
    val b = Packing.packNextFit(
      in.orderBy(col("toks")).repartition(3), "doc_id", "toks", budget, buckets)
    a.join(b.select(col("doc_id"), col("bin_id").as("bin_b")), Seq("doc_id"))
      .filter(col("bin_id") =!= col("bin_b")).count() shouldBe 0
  }

  it should "equal a sequential next-fit-decreasing reference bit-for-bit" in {
    // the assignment is DEFINED deterministically, so a plain Scala
    // replay of the contract (per id-mod bucket: sort (toks desc, id),
    // sweep, bin = bucket<<32 | seq) must reproduce the labels exactly
    // — random workloads incl. all-oversized and budget-boundary docs
    val rng = new scala.util.Random(4242)
    val docs = (0 until 700).map { i =>
      val tok = rng.nextInt(4) match {
        case 0 => 1L + rng.nextInt(10)            // tiny
        case 1 => budget - 2 + rng.nextInt(5)     // boundary straddlers
        case 2 => budget * (2 + rng.nextInt(3))   // oversized
        case _ => 1L + rng.nextInt(budget.toInt)  // general
      }
      (i.toLong, tok)
    }
    val expected = docs
      .groupBy { case (id, _) => (id % buckets).toInt }
      .flatMap { case (bucket, ds) =>
        var bin = 0L
        var fill = 0L
        var first = true
        ds.sortBy { case (id, tok) => (-tok, id) }.map { case (id, tok) =>
          if (!first && fill > 0L && fill + tok > budget) { bin += 1L; fill = 0L }
          first = false
          fill += tok
          id -> ((bucket.toLong << 32) | bin)
        }
      }
    import spark.implicits._
    val got = Packing.packNextFit(
        docs.toDF("doc_id", "toks").repartition(11), "doc_id", "toks",
        budget, buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    got shouldBe expected
  }
}
