package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class DocStreamsSpec extends SparkSpec {

  // long shared run so appended words keep Jaccard ≥ 0.8 on 3-gram shingles
  private val longText =
    "the quick brown fox jumps over the lazy dog again and again " * 3
  private val otherText =
    "completely different words entirely unrelated content sits here now"
  private val freshText =
    "a fresh novel document with its own wording and nothing shared one"

  "dedupIngest" should "dedup each micro-batch against the growing corpus index" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-docstream").toString
    val index = s"$tmp/index"
    val sink = s"$tmp/sink"
    val corpus = Seq(
      (1L, longText + "alpha beta gamma"),
      (2L, otherText)).toDF("doc_id", "text")
    Dedup.writeDedupIndex(corpus, "text", "doc_id", index)

    val mem = MemoryStream[(Long, String)]
    val q = DocStreams.dedupIngest(
      mem.toDF().toDF("doc_id", "text"), index, sink)
    try {
      mem.addData(
        (100L, longText + "alpha beta gamma delta"), // near-dup of corpus doc 1
        (101L, otherText),                           // exact dup of corpus doc 2
        (102L, freshText),                           // genuinely new → kept
        (103L, freshText))                           // exact dup within the batch
      q.processAllAvailable()
      mem.addData(
        // near-dup of doc 102, which was only just streamed in — drops
        // ONLY if batch 1 extended the index (the property under test)
        (200L, freshText + " two"),
        (201L, "another genuinely new piece of text streaming in the second batch"))
      q.processAllAvailable()
    } finally q.stop()

    val decisions = spark.read.parquet(s"$sink/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    decisions shouldBe Map(
      100L -> "near_dup", 101L -> "exact_dup_corpus",
      102L -> "kept", 103L -> "exact_dup_batch",
      200L -> "near_dup", 201L -> "kept")

    val kept = spark.read.parquet(s"$sink/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    kept shouldBe Set(102L, 201L)

    // the index now carries the survivors' artifacts, nothing else's
    val indexed = spark.read.parquet(s"$index/bands")
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    indexed shouldBe Set(1L, 2L, 102L, 201L)
  }

  "annIngest" should "make streamed vectors searchable in the persisted index" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-stream").toString
    val corpus = Seq(
      10L -> Array(1f, 0f, 0f, 0f), 12L -> Array(0f, 1f, 0f, 0f),
      14L -> Array(0f, 0f, 1f, 0f)).toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(corpus, tmp, k = 2, lloydIters = 1)

    val mem = MemoryStream[(Long, Array[Float])]
    val q = DocStreams.annIngest(
      mem.toDF().toDF("vec_id", "embedding"), tmp)
    try {
      mem.addData(20L -> Array(0f, 0f, 0f, 1f))
      q.processAllAvailable()
      mem.addData(30L -> Array(0.94f, 0.34f, 0f, 0f))
      q.processAllAvailable()
    } finally q.stop()

    // the batch-2 vector is the true nearest neighbor of this query
    // and must be found through the extended index (nprobe = all lists)
    val query = Seq(1L -> Array(0.95f, 0.3f, 0f, 0f)).toDF("vec_id", "embedding")
    val top = Similarity.annIndexTopK(tmp, query, topK = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    top.toSeq shouldBe Seq((1L, 30L))

    // replaying the same ingest batch (same epoch key — foreachBatch's
    // at-least-once contract after a crash) overwrites its own
    // partition instead of duplicating vectors
    val replay = Seq(40L -> Array(0f, 1f, 0f, 0.1f)).toDF("vec_id", "embedding")
    Similarity.appendAnnIndex(replay, tmp, epoch = 99L)
    Similarity.appendAnnIndex(replay, tmp, epoch = 99L)
    spark.read.parquet(s"$tmp/lists")
      .filter(col("vec_id") === 40L).count() shouldBe 1L
  }

  "mediaDedupIngest" should "dedup each media batch against the growing phash index" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Multimodal
    val tmp = java.nio.file.Files.createTempDirectory("graft-mediastream").toString
    val index = s"$tmp/index"
    val sink = s"$tmp/sink"
    def blob(id: Long, text: String) =
      Multimodal.MediaBlob(id, "en", text.getBytes("UTF-8"))
    Multimodal.writePhashIndex(spark,
      Seq(blob(1L, longText), blob(2L, otherText)).toDS(), index)

    val mem = MemoryStream[(Long, String, String)]
    val blobs = mem.toDF().toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
    val q = DocStreams.mediaDedupIngest(blobs, index, sink)
    try {
      mem.addData(
        (100L, "en", longText),   // same payload as corpus blob 1 → hamming 0
        (101L, "en", freshText),  // genuinely new → kept
        (102L, "en", freshText))  // identical payload within the batch → dropped
      q.processAllAvailable()
      mem.addData(
        // identical to doc 101, which was only just streamed in — drops
        // ONLY if batch 1 extended the index (the property under test)
        (200L, "en", freshText),
        (201L, "en", "a second wave of entirely new media bytes arriving now"))
      q.processAllAvailable()
    } finally q.stop()

    val decisions = spark.read.parquet(s"$sink/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    decisions shouldBe Map(
      100L -> "near_dup", 101L -> "kept", 102L -> "near_dup",
      200L -> "near_dup", 201L -> "kept")

    val kept = spark.read.parquet(s"$sink/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    kept shouldBe Set(101L, 201L)

    // the index carries corpus + kept signatures, nothing else's
    val indexed = spark.read.parquet(s"$index/phashes")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    indexed shouldBe Set(1L, 2L, 101L, 201L)
  }

  "docIngestBatch" should "rewrite byte-identical partitions on at-least-once replay" in {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-doc-replay").toString
    val index = s"$tmp/index"
    val sink = s"$tmp/sink"
    val corpus = Seq(
      (1L, longText + "alpha beta gamma"),
      (2L, otherText)).toDF("doc_id", "text")
    Dedup.writeDedupIndex(corpus, "text", "doc_id", index)

    val batch = Seq(
      (100L, longText + "alpha beta gamma delta"), // near-dup of corpus 1
      (101L, otherText),                           // exact dup of corpus 2
      (102L, freshText),                           // new → kept
      (103L, freshText))                           // exact dup within batch
      .toDF("doc_id", "text")
    // crash-replay: the same micro-batch id runs twice — the second
    // run sees an index already holding the batch's own artifacts
    DocStreams.docIngestBatch(batch, index, sink, "text", "doc_id", 0.8, batchId = 0L)
    val dec1 = spark.read.parquet(s"$sink/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    DocStreams.docIngestBatch(batch, index, sink, "text", "doc_id", 0.8, batchId = 0L)

    val dec2 = spark.read.parquet(s"$sink/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    dec2 shouldBe dec1
    dec2 shouldBe Map(
      100L -> "near_dup", 101L -> "exact_dup_corpus",
      102L -> "kept", 103L -> "exact_dup_batch")
    // exactly one copy of everything
    spark.read.parquet(s"$sink/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq shouldBe Seq(102L)
    spark.read.parquet(s"$sink/decisions").count() shouldBe 4L
    spark.read.parquet(s"$index/hashes")
      .filter(col("hash_doc_id") === 102L).count() shouldBe 1L
    spark.read.parquet(s"$index/bands")
      .filter(col("doc_id") === 102L).select(col("band")).distinct()
      .count() shouldBe spark.read.parquet(s"$index/bands")
      .filter(col("doc_id") === 1L).select(col("band")).distinct().count()
  }

  "annSearch" should "serve streamed queries identically to the batch index search" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-search").toString
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    Similarity.writeAnnIndex(corpus, s"$tmp/index", k = 4, lloydIters = 2)

    // two query batches with ids disjoint from the corpus
    val qs = corpus.filter(col("vec_id") < 6)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Float])]
    val q = DocStreams.annSearch(
      mem.toDF().toDF("vec_id", "embedding"), s"$tmp/index", s"$tmp/out",
      topK = 2, nprobe = 4)
    try {
      mem.addData(qs.take(3))
      q.processAllAvailable()
      mem.addData(qs.drop(3))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$tmp/out")
      .select(col("qid"), col("rnk"), col("cid"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = Similarity.annIndexTopK(
        s"$tmp/index",
        corpus.filter(col("vec_id") < 6)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
        topK = 2, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    streamed shouldBe batch
    streamed.size shouldBe 12 // 6 queries × top-2
  }

  "mediaIngestBatch" should "overwrite its own partitions on at-least-once replay" in {
    import spark.implicits._
    import graft.ops.Multimodal
    val tmp = java.nio.file.Files.createTempDirectory("graft-media-replay").toString
    val index = s"$tmp/index"
    val sink = s"$tmp/sink"
    def blob(id: Long, text: String) =
      Multimodal.MediaBlob(id, "en", text.getBytes("UTF-8"))
    Multimodal.writePhashIndex(spark, Seq(blob(1L, longText)).toDS(), index)

    val batch = Seq(
      (100L, "en", longText),   // dup of corpus blob 1
      (101L, "en", freshText),  // genuinely new → kept
      (102L, "en", freshText))  // in-batch dup of 101
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"))
    // the crash-replay scenario: the same micro-batch id runs twice
    DocStreams.mediaIngestBatch(batch, index, sink, maxHamming = 15, batchId = 0L)
    DocStreams.mediaIngestBatch(batch, index, sink, maxHamming = 15, batchId = 0L)

    // exactly ONE copy of everything — no duplicated sink docs,
    // decisions, or index signatures
    spark.read.parquet(s"$sink/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq shouldBe Seq(101L)
    val dec = spark.read.parquet(s"$sink/decisions")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    dec shouldBe Map(100L -> "near_dup", 101L -> "kept", 102L -> "near_dup")
    spark.read.parquet(s"$sink/decisions").count() shouldBe 3L
    spark.read.parquet(s"$index/phashes")
      .filter(col("doc_id") === 101L).count() shouldBe 1L
  }

  "hammingNearDupsIncremental" should "equal full mining restricted to batch-touching pairs" in {
    import spark.implicits._
    val sigs = Seq(
      (1L, 0x0F0FL), (2L, 0x0F0EL), (3L, 0x7777123456789ABCL),
      (10L, 0x0F0DL), (11L, 0x7777123456789ABDL), (12L, 0x0123456789ABCDEFL))
      .toDF("doc_id", "phash")
    val corpus = sigs.filter(col("doc_id") < 10)
    val batch = sigs.filter(col("doc_id") >= 10)
    val inc = Dedup.hammingNearDupsIncremental(
        corpus, batch, "doc_id", "phash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Dedup.hammingNearDups(sigs, "doc_id", "phash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = full.filter(p => p._1 >= 10 || p._2 >= 10)
    inc shouldBe expected
    inc should not be empty
    // and corpus-corpus pairs (1,2) are mined by full but not incremental
    full.exists(p => p._1 == 1L && p._2 == 2L) shouldBe true
    inc.exists(p => p._1 == 1L && p._2 == 2L) shouldBe false
  }

  "batchDecisions" should "match the batch incremental operators on real documents" in {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-docstream-real").toString
    Dedup.writeDedupIndex(
      real.filter(col("doc_id") < 250), "text", "doc_id", tmp)
    val batch = real.filter(col("doc_id") >= 250)
    val decisions = DocStreams.batchDecisions(batch, tmp, "text", "doc_id", 0.8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    decisions.keySet shouldBe
      batch.select(col("doc_id")).collect().map(_.getLong(0)).toSet

    // every doc the pair-level operators implicate is dropped, and the
    // drop reasons agree with the exact classifier
    val exact = Dedup.exactGroupsIncremental(
        spark.read.parquet(s"$tmp/hashes"), batch, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    exact.foreach { case (id, st) =>
      if (st == "dup_of_corpus") decisions(id) shouldBe "exact_dup_corpus"
      if (st == "dup_in_batch") decisions(id) shouldBe "exact_dup_batch"
    }
    val pairs = Dedup.minhashNearDupsIndexed(tmp, batch, "text", "doc_id", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      // the larger id of any verified pair never survives
      decisions.get(math.max(a, b)).foreach { st => st should not be "kept" }
    }
  }

  "shardIngest" should "compact to a layout independent of stream batching" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sink = tmpDir("shard-ingest-sink")
    val oneShot = tmpDir("shard-ingest-oneshot")
    graft.io.Fs.deleteRecursive(spark, sink)
    val all = (0L until 120L).map(i => (i, s"doc $i", 10L + i % 40))
    val mem = MemoryStream[(Long, String, Long)]
    val q = DocStreams.shardIngest(
      mem.toDF().toDF("doc_id", "text", "n_chars"), "doc_id", 1, sink)
    try {
      mem.addData(all.take(50): _*)
      q.processAllAvailable()
      mem.addData(all.drop(50): _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(sink).count() shouldBe 120

    graft.ops.Sharding.compactShards(spark, "doc_id", sink)
    graft.ops.Sharding.writeShards(
      all.toDF("doc_id", "text", "n_chars"), "doc_id", 1, oneShot)
    val a = spark.read.parquet(sink)
      .orderBy(col("shard"), col("shard_order"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    val b = spark.read.parquet(oneShot)
      .orderBy(col("shard"), col("shard_order"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    a shouldBe b
    a.length shouldBe 120
  }

  "lmScoreIngest" should "score a cross-corpus stream exactly like the batch indexed path" in {
    import spark.implicits._
    val base = freshDir("lm_stream")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // model trained on HALF the corpus; the OTHER half streams in —
    // cross-corpus misses must take the UNK/floor ladder identically
    // in both modes
    val train = docs.filter(col("doc_id") % 2 === 0)
    val scoreMe = docs.filter(col("doc_id") % 2 === 1)
    graft.ops.LangModel.writeLmModel(train, col("text"), s"$base/model")
    scoreMe.coalesce(3).write.parquet(s"$base/in") // 3 micro-batches
    val stream = spark.readStream.schema(scoreMe.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in")
    val q = DocStreams.lmScoreIngest(stream, s"$base/model", s"$base/sink")
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(s"$base/sink/scores")
      .select("doc_id", "n_bigrams", "sum_cost", "avg_cost")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = graft.ops.LangModel.lmScoresIndexed(
        scoreMe, col("text"), col("doc_id"), s"$base/model")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    streamed shouldBe batch
    streamed.size should be > 100
  }

  "searchIndexIngest" should "serve streamed batches exactly like a one-shot index" in {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = freshDir("search_stream_index")
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "apple banana banana"),
      (3L, "apple cherry cherry date"),
      (4L, "banana date date"),
      (5L, "apple apple apple banana cherry date"))
    val mem = MemoryStream[(Long, String)]
    val q = DocStreams.searchIndexIngest(
      mem.toDF().toDF("doc_id", "text"), index)
    try {
      mem.addData(corpus.take(2): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.ops.Retrieval.searchIndexed(spark, index, q = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    val oneShot = graft.ops.Retrieval.search(
        corpus.toDF("doc_id", "text"), "text", "doc_id", q = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    streamed shouldBe oneShot
    streamed.size should be > 2
  }
}
