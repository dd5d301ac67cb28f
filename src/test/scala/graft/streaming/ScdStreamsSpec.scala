package graft.streaming

import graft.SparkSpec
import graft.etl.Scd
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SCD2 contracts: a live 2-batch stream folds to EXACTLY the
  * one-shot rebuild; replays are no-ops through both idempotence layers
  * (batch marker, late-drop); the per-batch history read is
  * partition-pruned to touched buckets. */
class ScdStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("k", "version", "effective_from", "effective_to",
    "is_current", "attr")

  private def histOf(rows: Seq[(Long, Long, Long, String)]) =
    Scd.scd2FromEvents(rows.toDF("k", "t", "tie", "attr"),
      col("k"), col("t"), Seq(col("attr")), Seq(col("tie")))
      .select(cols.map(col): _*)

  private val preCut = Seq(
    (1L, 10L, 1L, "a"), (1L, 20L, 1L, "b"),
    (2L, 10L, 1L, "x"),
    (3L, 15L, 1L, "m"))
  private val batch1 = Seq((1L, 30L, 1L, "c"), (4L, 30L, 1L, "new"))
  private val batch2 = Seq((1L, 40L, 1L, "c"), (2L, 40L, 1L, "y"))

  private def sortedHist(df: org.apache.spark.sql.DataFrame) =
    df.select(cols.map(col): _*).orderBy("k", "version")
      .collect().map(_.toSeq).toSeq

  "scdIngest" should "fold a live stream to the one-shot rebuild" in {
    val base = freshDir("scd_stream")
    val path = base + "/hist"
    ScdStreams.writeScdHistory(histOf(preCut), path, "k", buckets = 4)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = ScdStreams.scdIngest(
      mem.toDF().toDF("k", "t", "tie", "attr"), path,
      base + "/ckpt", "k", "t", Seq("attr"), Seq("tie"),
      buckets = 4)
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = sortedHist(ScdStreams.readScdHistory(spark, path))
    val rebuild = sortedHist(histOf(preCut ++ batch1 ++ batch2))
    streamed shouldBe rebuild
  }

  it should "be a no-op on replays through both idempotence layers" in {
    val path = freshDir("scd_replay") + "/hist"
    ScdStreams.writeScdHistory(histOf(preCut), path, "k", buckets = 4)
    val b1 = batch1.toDF("k", "t", "tie", "attr")

    ScdStreams.applyScdBatch(b1, path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    val once = sortedHist(ScdStreams.readScdHistory(spark, path))

    // layer 1: the batch marker short-circuits a replayed id
    ScdStreams.applyScdBatch(b1, path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe once

    // layer 2: even with the marker GONE (crash window), re-applying
    // is a no-op — every observation is now at/before its key's
    // current effective_from and late-drops
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_applied/batch=0"), true)
    ScdStreams.applyScdBatch(b1, path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe once
  }

  it should "recover a bucket parked mid-swap in its .old aside" in {
    // Simulate replaceDir's crash window: bucket renamed to .old, the
    // staged dir never renamed in, process died. The bucket's ONLY
    // copy is the aside; the replay must get it back, not rebuild the
    // bucket from the batch alone (which would silently drop every
    // untouched key's history in it).
    val path = freshDir("scd_aside") + "/hist"
    ScdStreams.writeScdHistory(histOf(preCut), path, "k", buckets = 4)
    val expected = sortedHist(ScdStreams.readScdHistory(spark, path))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b = Seq(1L).toDF("k")
      .select(ScdStreams.bucketOf(col("k"), 4).as("b"))
      .head().getLong(0)
    val live = new org.apache.hadoop.fs.Path(s"$path/bucket=$b")
    val aside = new org.apache.hadoop.fs.Path(s"$path/bucket=$b.old")
    fs.rename(live, aside) shouldBe true // the crash state
    fs.exists(live) shouldBe false

    // a plain read repairs and sees the full history
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe expected

    // same crash state again, then the REPLAYED batch applies: the
    // recovered bucket's untouched keys (k=1's pre-cut versions hash
    // there) must survive the apply
    fs.rename(live, aside) shouldBe true
    ScdStreams.applyScdBatch(
      batch1.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    val applied = sortedHist(ScdStreams.readScdHistory(spark, path))
    applied shouldBe sortedHist(histOf(preCut ++ batch1))
    fs.exists(aside) shouldBe false

    // the OTHER aside state — swap completed but its cleanup delete
    // didn't run (live present AND aside present): the aside is stale
    // and must be dropped, the live bucket kept
    fs.mkdirs(new org.apache.hadoop.fs.Path(aside, "stale"))
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe applied
    fs.exists(aside) shouldBe false
  }

  it should "fold per-batch markers into a watermark that still gates replays" in {
    val path = freshDir("scd_markers") + "/hist"
    ScdStreams.writeScdHistory(histOf(preCut), path, "k", buckets = 4)
    ScdStreams.applyScdBatch(batch1.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    ScdStreams.applyScdBatch(batch2.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 1L)
    val once = sortedHist(ScdStreams.readScdHistory(spark, path))
    val applied = new java.io.File(s"$path/_applied")
    applied.list().sorted shouldBe Array("batch=0", "batch=1")

    ScdStreams.compactScdMarkers(spark, path)
    applied.list().toSeq shouldBe Seq("upto=1")

    // the watermark still short-circuits replays of compacted batches
    ScdStreams.applyScdBatch(batch1.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe once

    // later batches marker past the watermark and compact into it
    ScdStreams.applyScdBatch(
      Seq((2L, 50L, 1L, "z")).toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 2L)
    applied.list().sorted shouldBe Array("batch=2", "upto=1")
    ScdStreams.compactScdMarkers(spark, path)
    applied.list().toSeq shouldBe Seq("upto=2")
    // compacting again is a no-op
    ScdStreams.compactScdMarkers(spark, path)
    applied.list().toSeq shouldBe Seq("upto=2")
  }

  it should "archive closed versions without changing the full history" in {
    val path = freshDir("scd_archive") + "/hist"
    ScdStreams.writeScdHistory(histOf(preCut), path, "k", buckets = 4)
    ScdStreams.applyScdBatch(batch1.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    val full = sortedHist(ScdStreams.readScdHistoryFull(spark, path, "k"))

    // horizon 25: closed versions whose effective_to ≤ 25 move out
    ScdStreams.archiveScdHistory(spark, path, "k", lit(25L))
    val live = ScdStreams.readScdHistory(spark, path)
    live.filter(!col("is_current") && col("effective_to") <= 25).count() shouldBe 0
    live.filter(col("is_current")).count() shouldBe
      histOf(preCut ++ batch1).filter(col("is_current")).count()
    // live ∪ archive is exactly the unarchived history
    sortedHist(ScdStreams.readScdHistoryFull(spark, path, "k")) shouldBe full

    // the archived rows live under the sibling tree
    new java.io.File(s"$path.archive").list()
      .count(_.startsWith("epoch=")) shouldBe 1

    // re-running with the same horizon adds nothing (anti-join)
    ScdStreams.archiveScdHistory(spark, path, "k", lit(25L))
    new java.io.File(s"$path.archive").list()
      .count(_.startsWith("epoch=")) shouldBe 1

    // a batch applied AFTER archival folds correctly (apply only needs
    // current rows) and the full view keeps every version
    ScdStreams.applyScdBatch(batch2.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 1L)
    val expect = sortedHist(histOf(preCut ++ batch1 ++ batch2))
    sortedHist(ScdStreams.readScdHistoryFull(spark, path, "k")) shouldBe expect
  }

  it should "rebucket the history atomically and keep markers and meta" in {
    val path = freshDir("scd_rebucket") + "/hist"
    ScdStreams.writeScdHistory(histOf(preCut), path, "k", buckets = 4)
    ScdStreams.readScdBuckets(spark, path) shouldBe Some(4)
    ScdStreams.applyScdBatch(batch1.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 0L)
    val before = sortedHist(ScdStreams.readScdHistory(spark, path))

    ScdStreams.rebucketScdHistory(spark, path, "k", newBuckets = 8)
    ScdStreams.readScdBuckets(spark, path) shouldBe Some(8)
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe before
    // every row sits in the bucket the NEW count hashes it to
    spark.read.parquet(path)
      .filter(col("bucket") =!= ScdStreams.bucketOf(col("k"), 8))
      .count() shouldBe 0
    // the watermark survived the swap and still gates the old batch
    ScdStreams.applyScdBatch(batch1.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 8, 0L)
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe before
    // a stale caller still passing the OLD bucket count fails loudly
    an[IllegalArgumentException] should be thrownBy
      ScdStreams.applyScdBatch(batch2.toDF("k", "t", "tie", "attr"),
        path, "k", "t", Seq("attr"), Seq("tie"), 4, 1L)
    // and the new count folds normally
    ScdStreams.applyScdBatch(batch2.toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 8, 1L)
    sortedHist(ScdStreams.readScdHistory(spark, path)) shouldBe
      sortedHist(histOf(preCut ++ batch1 ++ batch2))
  }

  it should "prune the history read to touched buckets" in {
    val path = freshDir("scd_prune") + "/hist"
    ScdStreams.writeScdHistory(histOf(preCut), path, "k", buckets = 4)
    val touched = Seq(1L).toDF("k")
      .select(ScdStreams.bucketOf(col("k"), 4).as("b"))
      .collect().map(_.getLong(0))
    val pruned = spark.read.parquet(path)
      .filter(col("bucket").isin(touched.map(Long.box): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("bucket")
    // untouched buckets' files stay byte-identical after an apply
    val before = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(d =>
        d.getName -> d.listFiles().map(f => (f.getName, f.lastModified())).toSet)
      .toMap
    ScdStreams.applyScdBatch(
      Seq((1L, 50L, 1L, "z")).toDF("k", "t", "tie", "attr"),
      path, "k", "t", Seq("attr"), Seq("tie"), 4, 7L)
    val after = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(d =>
        d.getName -> d.listFiles().map(f => (f.getName, f.lastModified())).toSet)
      .toMap
    val touchedDir = s"bucket=${touched.head}"
    after.keySet shouldBe before.keySet
    before.keySet.filterNot(_ == touchedDir).foreach { d =>
      after(d) shouldBe before(d) // untouched partitions untouched
    }
    after(touchedDir) should not be before(touchedDir)
  }
}
