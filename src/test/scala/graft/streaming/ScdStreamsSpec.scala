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
