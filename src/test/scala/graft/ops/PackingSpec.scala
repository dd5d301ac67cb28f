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

  "Packing.packDocs" should "label bodies identically to the pairs kernel" in {
    import spark.implicits._
    val in = synth(500)
      .withColumn("body", concat(lit("payload-"), col("doc_id")))
    val carried = Packing.packDocs(in, "doc_id", "toks", budget, buckets)
    // full body columns survive, plus (bucket, bin_id)
    carried.columns.toSeq shouldBe Seq("doc_id", "toks", "body", "bucket", "bin_id")
    val pairs = Packing.packNextFit(
      in.select("doc_id", "toks"), "doc_id", "toks", budget, buckets)
    carried.select(col("doc_id"), col("bin_id"))
      .join(pairs.select(col("doc_id"), col("bin_id").as("bin_p")), Seq("doc_id"))
      .filter(col("bin_id") =!= col("bin_p")).count() shouldBe 0
    carried.filter(col("body") =!= concat(lit("payload-"), col("doc_id")))
      .count() shouldBe 0
    // the bodies cross the wire exactly once: the bucket repartition is
    // the plan's ONLY exchange (no skinny-assignment join-back)
    val plan = carried.queryExecution.executedPlan.toString
    "(?i)exchange".r.findAllIn(plan).length shouldBe 1
  }

  "Packing.writePackedBins" should "write one bin-contiguous file per bucket" in {
    import spark.implicits._
    val dir = tmpDir("packed-bins")
    val in = synth(500)
      .withColumn("body", concat(lit("payload-"), col("doc_id")))
    Packing.writePackedBins(in, "doc_id", "toks", budget, buckets, dir)
    // hive layout: one directory per bucket, ONE parquet file each
    // (each bucket lives whole in exactly one write task)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).sortBy(_.getName)
    bucketDirs.map(_.getName).toSet shouldBe
      (0 until buckets).map(b => s"bucket=$b").toSet
    bucketDirs.foreach { bd =>
      bd.listFiles().count(_.getName.endsWith(".parquet")) shouldBe 1
    }
    // read-back assignments equal the pairs kernel's, and within each
    // bucket file the rows are bin-contiguous in file order (a reader
    // streaming the file sees every bin whole)
    val pairs = Packing.packNextFit(
      in.select("doc_id", "toks"), "doc_id", "toks", budget, buckets)
    val back = spark.read.parquet(dir)
    back.select(col("doc_id"), col("bin_id"))
      .join(pairs.select(col("doc_id"), col("bin_id").as("bin_p")), Seq("doc_id"))
      .filter(col("bin_id") =!= col("bin_p")).count() shouldBe 0
    bucketDirs.foreach { bd =>
      val bins = spark.read.parquet(bd.getAbsolutePath)
        .select("bin_id").collect().map(_.getLong(0))
      bins shouldBe bins.sorted
    }
  }
}
