package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class ShardingSpec extends SparkSpec {

  private def synth(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"doc $i body", (10 + i % 90).toLong))
      .toDF("doc_id", "text", "n_chars")
  }

  "Sharding.manifest" should "match a plain group-by over the md5 prefix" in {
    val df = synth(800)
    val want = df
      .groupBy(substring(md5(col("doc_id").cast("string")), 1, 2).as("shard"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("size_sum"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
    val got = Sharding.manifest(df, "doc_id", "n_chars", 2)
    got.exceptAll(want).count() shouldBe 0
    want.exceptAll(got).count() shouldBe 0
    // totals conserve
    got.agg(sum("n_docs")).head.getLong(0) shouldBe 800L
  }

  "Sharding.writeShards" should "lay out hive partitions holding exactly the corpus" in {
    val df = synth(500)
    val path = tmpDir("shards-layout")
    Sharding.writeShards(df, "doc_id", 1, path)
    // 16 one-hex-char shard dirs (500 uniform draws hit all 16 w.h.p.)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    dirs.length shouldBe 16
    val back = spark.read.parquet(path)
    back.count() shouldBe 500
    // content identical to the logical assignment (shard is read back
    // as a partition column)
    val want = Sharding.assignShards(df, "doc_id", 1)
    back.select("doc_id", "text", "n_chars", "shard", "shard_order")
      .exceptAll(want.select("doc_id", "text", "n_chars", "shard", "shard_order"))
      .count() shouldBe 0
  }

  it should "partition-prune a single-shard read" in {
    val df = synth(400)
    val path = tmpDir("shards-prune")
    Sharding.writeShards(df, "doc_id", 1, path)
    val one = spark.read.parquet(path).filter(col("shard") === "a")
    one.collect()
    // the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan row filter
    val plan = one.queryExecution.executedPlan.toString
    plan should include regex """PartitionFilters: \[[^\]]*shard#\d+[^\]]*= a"""
    // and the selected file set is just the one directory
    val scan = one.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }.get.collectFirst { case s: FileSourceScanExec => s }.get
    val selected = scan.inputRDDs().head.partitions.length
    selected should be >= 1
    one.count() shouldBe Sharding.assignShards(df, "doc_id", 1)
      .filter(col("shard") === "a").count()
  }

  "Sharding.writeShardBatch" should "be replay-idempotent and compact to the one-shot layout" in {
    val df = synth(400)
    import spark.implicits._
    val streamed = tmpDir("shards-streamed")
    val oneShot = tmpDir("shards-oneshot")
    // batch-keyed appends never clear the root (by design — that's the
    // compaction's job), so a re-run must start from an empty layout
    graft.io.Fs.deleteRecursive(spark, streamed)
    val batches = Seq(
      df.filter(col("doc_id") % 3 === 0),
      df.filter(col("doc_id") % 3 === 1),
      df.filter(col("doc_id") % 3 === 2))
    batches.zipWithIndex.foreach { case (b, i) =>
      Sharding.writeShardBatch(b, "doc_id", 1, streamed, i.toLong)
    }
    // at-least-once replay of batch 1 rewrites its own partitions
    Sharding.writeShardBatch(batches(1), "doc_id", 1, streamed, 1L)
    spark.read.parquet(streamed).count() shouldBe 400

    Sharding.compactShards(spark, "doc_id", streamed)
    Sharding.writeShards(df, "doc_id", 1, oneShot)
    // single epoch partition, ≤ one file per shard
    new java.io.File(streamed).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSeq shouldBe Seq("batch=-1")
    // layout equality with the one-shot writer: same rows, same order
    val a = spark.read.parquet(streamed)
      .orderBy(col("shard"), col("shard_order"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    val b = spark.read.parquet(oneShot)
      .orderBy(col("shard"), col("shard_order"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    a shouldBe b
    a.length shouldBe 400
  }

  "Sharding.writeShards" should "produce the global md5 permutation across shards" in {
    val df = synth(300)
    val path = tmpDir("shards-order")
    Sharding.writeShards(df, "doc_id", 1, path)
    import spark.implicits._
    val streamed = spark.read.parquet(path)
      .orderBy(col("shard"), col("shard_order"), col("doc_id"))
      .select("doc_id").as[Long].collect()
    val expected = df
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .select("doc_id").as[Long].collect()
    streamed.toSeq shouldBe expected.toSeq
  }
}
