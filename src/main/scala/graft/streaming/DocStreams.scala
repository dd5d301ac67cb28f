package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup
import graft.tools.Ckpt._

/** Streaming corpus ingest with per-micro-batch deduplication against a
  * PERSISTED dedup index — the streaming twin of the batch incremental
  * path (`q_dedup_incremental` / `q_dedup_exact_incremental`).
  *
  * Shape: `readStream → foreachBatch`. Each micro-batch is a batch
  * DataFrame, so the whole incremental-dedup toolchain applies as-is:
  *
  *  1. exact-classify the batch against the stored content-hash set
  *     ([[Dedup.exactGroupsIncremental]]) and drop exact dups;
  *  2. near-dup-mine the exact survivors against the stored band index
  *     ([[Dedup.minhashNearDupsIndexed]] — the corpus is consulted only
  *     through its persisted bands/shingles, never re-shingled);
  *  3. resolve the pair graph to a keep/drop decision (any batch doc
  *     whose near-dup component touches the corpus is dropped; within a
  *     batch-only component the minimum id survives — components via
  *     [[Dedup.connectedComponents]], whose single-task union-find path
  *     makes this one bounded job for per-batch pair volumes);
  *  4. append the survivors to the corpus sink, append their
  *     bands/shingles/hashes to the index
  *     ([[Dedup.appendDedupIndex]]), and append a per-doc decision row
  *     to the audit log.
  *
  * Because the index is EXTENDED each batch and re-read from storage on
  * the next, batch N+1 dedups against everything batch N ingested —
  * asserted in `DocStreamsSpec` (a later near-dup of an
  * earlier-streamed doc is dropped).
  *
  * foreachBatch (not record-at-a-time transforms) is the right
  * Structured Streaming tool here: the per-batch work is a multi-join
  * batch job against out-of-band state (the index), which is exactly
  * the contract foreachBatch exists for. Micro-batches execute
  * serially, so index read-extend-read is race-free by construction.
  *
  * 100 TB posture: per-batch cost ∝ batch size + band collisions (the
  * incremental property, measured by `q_dedup_incremental`); the index
  * grows with the UNIQUE corpus only. The decision graph per batch is
  * bounded by the batch's near-dup degree, not corpus size. Every sink
  * and index write is keyed by the micro-batch id (`.../batch=<id>`,
  * overwrite mode) and the decision logic is replay-stable (id-aware
  * exact dedup, batch ids excluded from the corpus view when mining),
  * so checkpointLocation + this layout gives effectively-once delivery
  * on top of foreachBatch's at-least-once contract — asserted by the
  * replay-twice specs in `DocStreamsSpec`. On a real deployment the
  * same parquet writes point at the object store.
  */
object DocStreams {

  /** The pure per-batch decision: which docs of `batch` survive ingest
    * against the persisted index at `indexPath`, and why. Returns
    * (doc_id, status) for EVERY batch doc. Factored out of the sink so
    * the semantics are testable without a streaming harness. */
  def batchDecisions(
      batch: DataFrame, indexPath: String,
      textCol: String, idCol: String, threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    val hashes = spark.read.parquet(s"$indexPath/hashes")
    val exact = Dedup.exactGroupsIncremental(hashes, batch, textCol, idCol)
      .checkpointLinted() // small: one (id, hash, status) row per batch doc
    val exactNew = batch.join(
      exact.filter(col("status") === "new").select(col("doc_id").as(idCol)), idCol)

    val pairs = Dedup.minhashNearDupsIndexed(indexPath, exactNew, textCol, idCol, threshold)
    val batchIds = exact.filter(col("status") === "new")
      .select(col("doc_id"), lit(true).as("in_batch"))
    // the mined pairs are already an eager cut (checkpointed verified
    // pairs), so the components step can skip its redundant re-cut
    val nearDropped = nearDupDropped(pairs, batchIds, pairsMaterialized = true)

    exact.select(col("doc_id"),
        when(col("status") === "dup_of_corpus", lit("exact_dup_corpus"))
          .when(col("status") === "dup_in_batch", lit("exact_dup_batch"))
          .otherwise(lit("kept")).as("status"))
      .join(nearDropped.select(col("doc_id"), lit(true).as("nd")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("nd"), lit("near_dup")).otherwise(col("status")).as("status"))
  }

  /** Shared keep/drop verdict over a batch-touching near-dup pair
    * graph: a batch doc is dropped if its component touches the corpus
    * (the earlier-ingested copy wins) or it is not the minimum batch id
    * of a batch-only component. `batchIds` = (doc_id, in_batch=true)
    * for the batch side; pair ids absent from it are corpus docs.
    * Returns the dropped (doc_id) rows. */
  private def nearDupDropped(pairs: DataFrame, batchIds: DataFrame,
      pairsMaterialized: Boolean = false): DataFrame = {
    val comp = Dedup.connectedComponents(pairs, // (id, comp) — local-path sized
      inputMaterialized = pairsMaterialized)
    val labeled = comp.join(batchIds, comp("id") === batchIds("doc_id"), "left")
    // a component survives inside the batch iff it contains no corpus
    // doc; its surviving member is the minimum batch id
    val verdict = labeled.groupBy(col("comp"))
      .agg(
        max(when(col("in_batch").isNull, lit(1)).otherwise(lit(0))).as("touches_corpus"),
        min(when(col("in_batch"), col("id"))).as("min_batch_id"))
    labeled.filter(col("in_batch"))
      .join(verdict, "comp")
      .filter(col("touches_corpus") === 1 || col("id") =!= col("min_batch_id"))
      .select(col("id").as("doc_id"))
  }

  /** The pure per-batch MEDIA decision: which payloads of a signature
    * batch survive ingest against the persisted perceptual-hash set at
    * `indexPath/phashes`. Pairs are mined incrementally
    * ([[Dedup.hammingNearDupsIncremental]] — corpus-only band buckets
    * pruned before fan-out, the corpus contributes one scan of 8-byte
    * signatures), then the shared component verdict applies. Returns
    * (doc_id, status ∈ kept | near_dup) for every batch doc. */
  def mediaBatchDecisions(
      batchSigs: DataFrame, indexPath: String, maxHamming: Int): DataFrame = {
    val spark = batchSigs.sparkSession
    val corpus = spark.read.parquet(s"$indexPath/phashes")
    val sigs = batchSigs.select(col("doc_id"), col("phash"))
    val pairs = Dedup.hammingNearDupsIncremental(
      corpus, sigs, "doc_id", "phash", maxHamming)
    val batchIds = sigs.select(col("doc_id"), lit(true).as("in_batch"))
    val dropped = nearDupDropped(pairs, batchIds)
    sigs.select(col("doc_id"))
      .join(dropped.withColumn("nd", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("nd"), lit("near_dup")).otherwise(lit("kept")).as("status"))
  }

  /** Streaming MEDIA ingest with per-batch perceptual dedup — the
    * multimodal twin of [[dedupIngest]]: each micro-batch of
    * (doc_id, lang, payload) blobs is blockhashed partition-locally
    * ([[graft.ops.Multimodal.blockhash64]] — payloads never shuffle),
    * deduped against the persisted signature set, survivors written
    * to `sinkPath/docs` (+ decisions to `sinkPath/decisions`) and
    * their signatures to `indexPath/phashes` — so batch N+1 dedups
    * against everything batch N kept (asserted live in
    * `DocStreamsSpec`). Bootstrap the index with
    * [[graft.ops.Multimodal.writePhashIndex]] at corpus-build time.
    *
    * Every sink write is keyed by the micro-batch id
    * (`.../batch=<id>`, overwrite mode — the [[annIngest]] /
    * [[graft.ops.Similarity.appendAnnIndexBatch]] layout), so an
    * at-least-once REPLAY of a batch after a crash overwrites its own
    * partition instead of duplicating sink docs and index signatures;
    * readers see all batches through one partitioned-parquet read.
    * Idempotence is asserted by replaying a batch twice in
    * `DocStreamsSpec`.
    *
    * Per-batch cost ∝ batch + touched band buckets + one corpus
    * signature scan (8 bytes/doc); the index grows with kept docs
    * only. */
  def mediaDedupIngest(
      blobs: DataFrame, indexPath: String, sinkPath: String,
      maxHamming: Int = 15): StreamingQuery = {
    blobs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          mediaIngestBatch(batch, indexPath, sinkPath, maxHamming, batchId)
        ()
      }
      .start()
  }

  /** The per-micro-batch body of [[mediaDedupIngest]], factored out so
    * the replay-idempotence contract is testable without a streaming
    * harness: running it twice with the same `batchId` leaves exactly
    * one copy of the batch's docs, decisions, and signatures. */
  private[graft] def mediaIngestBatch(
      batch: DataFrame, indexPath: String, sinkPath: String,
      maxHamming: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val typed = batch
      .select(col("doc_id"), col("lang"), col("payload"))
      .as[graft.ops.Multimodal.MediaBlob]
    val sigs = graft.ops.Multimodal.blockhash64(spark, typed).toDF()
      .checkpointLinted() // 16 B per batch doc; read 3× below
    val decisions = mediaBatchDecisions(sigs, indexPath, maxHamming)
      .checkpointLinted()
    val keptIds = decisions.filter(col("status") === "kept")
      .select(col("doc_id"))
    batch.join(keptIds, "doc_id")
      .write.mode("overwrite").parquet(s"$sinkPath/docs/batch=$batchId")
    decisions.write.mode("overwrite")
      .parquet(s"$sinkPath/decisions/batch=$batchId")
    sigs.join(keptIds, "doc_id")
      .write.mode("overwrite").parquet(s"$indexPath/phashes/batch=$batchId")
  }

  /** Streaming EMBEDDING ingest: append each micro-batch of new
    * vectors to a persisted ANN index
    * ([[graft.ops.Similarity.writeAnnIndex]]) — assignment against the
    * stored centroids, appended to the hive-partitioned lists, cost ∝
    * batch. Freshly streamed vectors are immediately searchable by
    * [[graft.ops.Similarity.annIndexTopK]] (asserted live in
    * `DocStreamsSpec`); centroid retraining stays an epoch-level
    * rebuild, exactly like the dedup index contract. */
  def annIngest(
      vecs: DataFrame, indexPath: String): StreamingQuery = {
    // centroids are epoch-immutable: load them ONCE per stream, not
    // per micro-batch (a high-frequency stream of small batches would
    // otherwise pay a parquet read + collect per batch)
    val cents = graft.ops.Similarity.readCentroids(vecs.sparkSession, indexPath)
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId keys the batch's partition → an at-least-once replay
        // overwrites its own partition instead of duplicating vectors
        if (!batch.isEmpty)
          graft.ops.Similarity.appendAnnIndexBatch(batch, indexPath, cents, batchId)
        ()
      }
      .start()
  }

  /** Streaming ANN SEARCH — the serving twin of [[annIngest]]: each
    * micro-batch of query vectors is searched against the persisted
    * index ([[graft.ops.Similarity.annIndexTopK]] — centroids loaded
    * once per stream, candidate scan partition-pruned to the probed
    * lists, int8 shortlist + exact-decimal rescore) and the top-k
    * rows land in `sinkPath` keyed by micro-batch id (overwrite —
    * replay-idempotent like every sink in this file). Per-batch cost
    * ∝ batch · corpus/k · nprobe/cap² tasks; the corpus is never
    * rescanned in full precision. Batch ≡ stream equality is asserted
    * live in `DocStreamsSpec`. Query `vec_id`s must be disjoint from
    * the corpus ids (the [[graft.ops.Similarity.annIndexTopK]]
    * contract). */
  def annSearch(
      queries: DataFrame, indexPath: String, sinkPath: String,
      topK: Int, nprobe: Int = 4): StreamingQuery = {
    queries.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ops.Similarity.annIndexTopK(indexPath, batch, topK, nprobe)
            .write.mode("overwrite").parquet(s"$sinkPath/batch=$batchId")
        ()
      }
      .start()
  }

  /** Start the streaming ingest: `docs` must be a streaming DataFrame
    * with at least (`idCol`, `textCol`). Survivor rows (all input
    * columns) land in `sinkPath/docs`, decisions in
    * `sinkPath/decisions`, and the index at `indexPath` is extended
    * with each batch's survivors. Every write is keyed by the
    * micro-batch id (`.../batch=<id>`, overwrite) and the decision
    * logic re-derives byte-identical statuses against an index that
    * already holds the batch's own artifacts (id-aware exact dedup +
    * self-pair-free mining), so an at-least-once REPLAY after a crash
    * rewrites its own partitions instead of duplicating sink docs or
    * index rows — asserted by replaying a batch twice in
    * `DocStreamsSpec`. */
  def dedupIngest(
      docs: DataFrame, indexPath: String, sinkPath: String,
      textCol: String = "text", idCol: String = "doc_id",
      threshold: Double = 0.8): StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          docIngestBatch(batch, indexPath, sinkPath, textCol, idCol,
            threshold, batchId)
        ()
      }
      .start()
  }

  /** The per-micro-batch body of [[dedupIngest]], factored out (like
    * [[mediaIngestBatch]]) so the replay-idempotence contract is
    * testable without a streaming harness. */
  private[graft] def docIngestBatch(
      batch: DataFrame, indexPath: String, sinkPath: String,
      textCol: String, idCol: String, threshold: Double,
      batchId: Long): Unit = {
    val decisions = batchDecisions(batch, indexPath, textCol, idCol, threshold)
      .checkpointLinted() // one row per batch doc; read 3× below
    val survivors = batch.join(
      decisions.filter(col("status") === "kept").select(col("doc_id").as(idCol)), idCol)
      .checkpointLinted()
    // the sink writes and the index extension are independent once both
    // frames are materialized (disjoint output dirs, no read-after-write
    // between them): overlap (guide §2.6) instead of serializing five
    // driver-blocking writes per micro-batch
    graft.tools.Par.run(3)(Seq(
      () => survivors.write.mode("overwrite")
        .parquet(s"$sinkPath/docs/batch=$batchId"),
      () => decisions.write.mode("overwrite")
        .parquet(s"$sinkPath/decisions/batch=$batchId"),
      () => Dedup.appendDedupIndex(survivors, textCol, idCol, indexPath, batchId)))
    ()
  }

  /** Streaming EPOCH-LAYOUT ingest: deal each micro-batch of curated
    * docs into the sharded training layout
    * ([[graft.ops.Sharding.writeShardBatch]] — batch-id-keyed, so
    * at-least-once replays rewrite their own partitions). Shard and
    * within-shard order are pure md5 functions of the id, so after
    * [[graft.ops.Sharding.compactShards]] the layout is BYTE-ORDER
    * IDENTICAL to a one-shot [[graft.ops.Sharding.writeShards]] of the
    * same corpus — how the stream happened to batch the data leaves no
    * trace (asserted in `DocStreamsSpec`). */
  def shardIngest(
      docs: DataFrame, idCol: String, hexChars: Int,
      sinkPath: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ops.Sharding.writeShardBatch(
            batch, idCol, hexChars, sinkPath, batchId)
        ()
      }
      .start()

  /** Streaming LM scoring against a PERSISTED model
    * ([[graft.ops.LangModel.writeLmModel]]) — the streaming leg of the
    * train-once/score-forever posture: the quantized cost maps load
    * ONCE at stream start (≤ K + vocab entries under the topK-written
    * model) and every micro-batch scores through the same broadcast
    * kernel the batch path uses — so streamed scores are
    * value-identical to a one-shot [[graft.ops.LangModel
    * .lmScoresIndexed]] of the same rows, however the stream batches
    * them. Scores land batch-id-keyed (`scores/batch=<id>`, overwrite)
    * so at-least-once replays rewrite their own partition —
    * replay-idempotent like every sink here. Unseen bigrams take the
    * UNK/floor ladder (cross-corpus streams are first-class); the
    * model refreshes at epoch boundaries by restarting the stream on
    * a new index path, never inside it. */
  /** Streaming quality scoring against a persisted
    * [[graft.ops.QualityModel]] artifact: weights load ONCE at stream
    * start, every micro-batch scores through the shared scan-fused
    * path, scores land batch-id-keyed (replay-idempotent). Gated by
    * q_text_quality_stream_parity against the batch oracle. */
  def qualityScoreIngest(
      docs: DataFrame, modelPath: String, sinkPath: String): StreamingQuery = {
    val w = graft.ops.QualityModel.loadWeights(docs.sparkSession, modelPath)
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ops.QualityModel.scoredFrameWith(batch, w)
            .write.mode("overwrite").parquet(s"$sinkPath/scores/batch=$batchId")
        ()
      }
      .start()
  }

  /** Streaming BPE encode against a persisted [[graft.ops.Bpe]]
    * tokenizer: merges load ONCE at stream start, every micro-batch
    * lands its token-count PARTIALS batch-id-keyed — partials sum
    * associatively, so the re-aggregated sink equals a one-shot
    * encode of the streamed corpus (gated by
    * q_text_bpe_stream_parity against the batch oracle). */
  def bpeEncodeIngest(
      docs: DataFrame, modelPath: String, sinkPath: String): StreamingQuery = {
    val merges = graft.ops.Bpe.loadMerges(docs.sparkSession, modelPath)
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ops.Bpe.tokenPartialsWith(batch, merges)
            .write.mode("overwrite").parquet(s"$sinkPath/tokens/batch=$batchId")
        ()
      }
      .start()
  }

  /** Streaming inverted-index maintenance
    * ([[graft.ops.Retrieval]]): each micro-batch of (disjoint) docs
    * becomes one index batch — postings/doclen/vocab/stats under
    * `indexPath/<table>/batch=<id>` (overwrite ⇒ at-least-once replays
    * rewrite their own partitions). Because batches hold disjoint doc
    * sets, df and the corpus stats are ADDITIVE across them, so a
    * served query ([[graft.ops.Retrieval.searchIndexed]]) scores
    * bit-identically to a one-shot build of the streamed corpus —
    * however the stream happened to batch it (gated by
    * q_text_search_stream_parity against the batch oracle). */
  def searchIndexIngest(
      docs: DataFrame, indexPath: String,
      textCol: String = "text", idCol: String = "doc_id"): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ops.Retrieval.writeSearchIndex(
            batch, textCol, idCol, indexPath, batchId.toInt)
        ()
      }
      .start()

  /** Streaming zone-map maintenance: each micro-batch appends one
    * range-clustered batch (data + additive manifest) via
    * [[graft.io.Zones.appendZoned]] — batch-id-keyed dirs, so an
    * at-least-once replay rewrites the same batch and converges. */
  /** Streaming DRIFT maintenance: every micro-batch censuses against
    * the epoch's PINNED bucketing contract (written once via
    * [[graft.ops.CorpusStats.writeDriftMeta]]) and lands its additive
    * partial batch-id-keyed — overwrite makes at-least-once replays
    * idempotent, and because the census is an algebraic aggregate the
    * fold ([[graft.ops.CorpusStats.driftFromPartials]]) equals the
    * one-shot PSI under ANY batch split (the [[graft.ops.MatView]]
    * posture). Per-batch cost = one batch-sized census + a ≤ B-row
    * write; the stream is never rescanned. */
  def driftIngest(
      rows: DataFrame, path: String, valueCol: String, epochACol: String,
      buckets: Int, mn: Long, mx: Long): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ops.CorpusStats.writeDriftPartial(
            graft.ops.CorpusStats.psiCensusPinned(batch, col(valueCol),
              col(epochACol), buckets, mn, mx), path, batchId)
        ()
      }
      .start()

  def zoneIngest(
      rows: DataFrame, path: String, zoneCol: String,
      zones: Int): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.io.Zones.appendZoned(batch, path, zoneCol, zones, batchId.toInt)
        ()
      }
      .start()

  def lmScoreIngest(
      docs: DataFrame, modelPath: String, sinkPath: String,
      textCol: String = "text", idCol: String = "doc_id"): StreamingQuery = {
    val model = graft.ops.LangModel.loadModel(docs.sparkSession, modelPath)
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.ops.LangModel.scoreKernel(batch, col(textCol), col(idCol),
              model, exactModel = false)
            .write.mode("overwrite").parquet(s"$sinkPath/scores/batch=$batchId")
        ()
      }
      .start()
  }
}
