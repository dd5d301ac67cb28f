package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Epoch compaction for the three streamed-index layouts: folding
  * `batch=*` partitions into a fresh `batch=-1` must leave every
  * reader's results byte-identical while collapsing the per-batch file
  * accumulation. */
class CompactionSpec extends SparkSpec {

  private def batchDirs(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith("batch=")).toSet

  private def parquetFileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1
      else 0
    walk(new java.io.File(dir))
  }

  private def vec(i: Long): Array[Float] =
    Array.tabulate(8)(d => (((i * 31 + d * 7) % 13) - 6).toFloat)

  "compactAnnIndex" should "fold batches into one epoch with byte-identical search" in {
    import spark.implicits._
    val base = tmpDir("compact-ann") + "/idx"
    graft.io.Fs.deleteRecursive(spark, base)
    val corpus = (0L until 64L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(corpus, base, k = 4, lloydIters = 2)
    (1 to 3).foreach { b =>
      val batch = (100L * b until 100L * b + 8L)
        .map(i => (i, vec(i))).toDF("vec_id", "embedding")
      Similarity.appendAnnIndex(batch, base, epoch = b.toLong)
    }
    batchDirs(s"$base/lists") shouldBe
      Set("batch=-1", "batch=1", "batch=2", "batch=3")
    val qs = (1000L until 1008L).map(i => (i, vec(i * 3 + 1)))
      .toDF("vec_id", "embedding")
    def search(): Set[String] =
      Similarity.annIndexTopK(base, qs, topK = 3, nprobe = 4)
        .collect().map(_.toString).toSet
    val before = search()
    before should not be empty
    Similarity.compactAnnIndex(spark, base)
    batchDirs(s"$base/lists") shouldBe Set("batch=-1")
    search() shouldBe before
    // one file per non-empty list after the repartition(list) rewrite
    parquetFileCount(s"$base/lists") should be <= 4
  }

  "compactDedupIndex" should "preserve incremental decisions and collapse batches" in {
    import spark.implicits._
    val base = tmpDir("compact-dedup") + "/idx"
    graft.io.Fs.deleteRecursive(spark, base)
    def doc(i: Long, tail: String) =
      (i, s"the quick brown fox jumps over the lazy $tail number $i")
    val corpus = (1L to 6L).map(i => doc(i, "dog")).toDF("doc_id", "text")
    Dedup.writeDedupIndex(corpus, "text", "doc_id", base)
    Dedup.appendDedupIndex(
      (10L to 12L).map(i => doc(i, "cat")).toDF("doc_id", "text"),
      "text", "doc_id", base, batchId = 1L)
    Dedup.appendDedupIndex(
      (20L to 22L).map(i => doc(i, "owl")).toDF("doc_id", "text"),
      "text", "doc_id", base, batchId = 2L)
    Seq("shingles", "bands", "hashes").foreach { fam =>
      batchDirs(s"$base/$fam") shouldBe Set("batch=-1", "batch=1", "batch=2")
    }
    // doc 30 near-dups doc 1's family; doc 31 is an exact dup of doc 10
    val next = Seq(doc(30L, "dog"),
      (31L, doc(10L, "cat")._2)).toDF("doc_id", "text")
    def pairs(): Set[String] =
      Dedup.minhashNearDupsIndexed(base, next, "text", "doc_id", threshold = 0.5)
        .collect().map(_.toString).toSet
    def exact(): Set[String] =
      Dedup.exactGroupsIncremental(
        spark.read.parquet(s"$base/hashes"), next, "text", "doc_id")
        .collect().map(_.toString).toSet
    val (pairsBefore, exactBefore) = (pairs(), exact())
    pairsBefore should not be empty
    exactBefore.exists(_.contains("dup_of_corpus")) shouldBe true
    Dedup.compactDedupIndex(spark, base)
    Seq("shingles", "bands", "hashes").foreach { fam =>
      batchDirs(s"$base/$fam") shouldBe Set("batch=-1")
    }
    pairs() shouldBe pairsBefore
    exact() shouldBe exactBefore
  }

  it should "preserve the replayed-min-holder corner across compaction" in {
    import spark.implicits._
    val base = tmpDir("compact-dedup-replay") + "/idx"
    graft.io.Fs.deleteRecursive(spark, base)
    val shared = "identical shared text held by two different batches"
    Dedup.writeDedupIndex(
      Seq((5L, shared), (6L, "unrelated corpus filler text")).toDF("doc_id", "text"),
      "text", "doc_id", base)
    Dedup.appendDedupIndex(
      Seq((9L, shared)).toDF("doc_id", "text"),
      "text", "doc_id", base, batchId = 1L)
    // replay of doc 5: it is the MIN holder of `shared`, but batch 1's
    // doc 9 also holds it, so the replay must re-derive dup_of_corpus —
    // a min-only hash fold would collapse cmin=cmax=5 and flip it to
    // "new". The (min, max) fold keeps cmax=9 visible.
    def status(): Map[Long, String] =
      Dedup.exactGroupsIncremental(
        spark.read.parquet(s"$base/hashes"),
        Seq((5L, shared)).toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    status() shouldBe Map(5L -> "dup_of_corpus")
    Dedup.compactDedupIndex(spark, base)
    status() shouldBe Map(5L -> "dup_of_corpus")
  }

  "compactPhashIndex" should "merge signature batches row-identically" in {
    import spark.implicits._
    val base = tmpDir("compact-phash") + "/idx"
    graft.io.Fs.deleteRecursive(spark, base)
    // the corpus epoch + two streamed batches, written in the
    // mediaDedupIngest layout (one (doc_id, phash) row per blob)
    Seq((1L, 17L), (2L, 0x0f0fL)).toDF("doc_id", "phash")
      .write.parquet(s"$base/phashes/batch=-1")
    Seq((10L, 18L)).toDF("doc_id", "phash")
      .write.parquet(s"$base/phashes/batch=1")
    Seq((11L, 0xffL)).toDF("doc_id", "phash")
      .write.parquet(s"$base/phashes/batch=2")
    def rows(): Set[(Long, Long)] =
      spark.read.parquet(s"$base/phashes").select(col("doc_id"), col("phash"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = rows()
    before.size shouldBe 4
    Multimodal.compactPhashIndex(spark, base)
    batchDirs(s"$base/phashes") shouldBe Set("batch=-1")
    rows() shouldBe before
  }
}
