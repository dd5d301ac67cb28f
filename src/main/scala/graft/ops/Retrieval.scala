package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Full-text retrieval over a PERSISTED inverted index — the search
  * side of the corpus tooling (inspect/debug/eval lookups over a
  * pretraining corpus), and the classic IR posture: build the index
  * once per corpus epoch, serve conjunctive BM25 top-k queries from
  * the artifact without ever rescanning the documents.
  *
  * Artifact layout (all parquet, batch-appendable):
  * {{{
  *   path/postings/batch=K/shard=S/   (term, doc_id, tf)
  *   path/doclen/batch=K/             (doc_id, dl)
  *   path/vocab/batch=K/              (term, df)
  *   path/stats/batch=K/              (n_docs, sum_dl)      one row
  * }}}
  * `shard = xxhash64(term) mod 16` — a query reads ONLY its terms'
  * shards (partition-pruned scan; the spec asserts PartitionFilters),
  * the lexicon (`vocab`) and `stats` are vocabulary-/batch-sized.
  * Batches hold DISJOINT doc sets, so df and the corpus stats are
  * additive across batches and an appended index scores bit-identically
  * to a one-shot build — the sufficient-statistic posture every
  * persisted artifact in this repo follows.
  *
  * Scoring is Okapi BM25 (k1 = 1.2, b = 0.75, Lucene's +1-inside-log
  * idf), numerically IDENTICAL to [[graft.queries.TextQueries]]'
  * `q_text_bm25`: every double step in the same order, the per-term
  * contribution quantized to DECIMAL(18,9) (rule 5b — libm's ln() is
  * 1 ULP off Java's on a few percent of inputs), and the per-doc score
  * summed in EXACT decimal so multi-term scores are order-free.
  * Conjunctive semantics: a document qualifies iff it contains every
  * term of the query.
  *
  * Scale shape: the build is one tokenize scan + two partial aggs
  * (the tf census IS the postings table); a query touches query-terms
  * × their posting lists (pruned scan), joins the vocabulary-sized df
  * and doc-length sides, and cuts top-k per query with a window over
  * candidates only. Documents themselves never shuffle at query time
  * — at 100 TB the index is the only thing read.
  */
object Retrieval {

  val Shards = 16

  private def toks(docs: DataFrame, textCol: String, idCol: String) =
    docs.select(col(idCol).cast("long").as("doc_id"),
      explode(Text.tokens(col(textCol))).as("term"))

  /** The tf census — one row per (term, doc): the postings table. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    toks(docs, textCol, idCol)
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  /** In-memory index frames: (postings, doclen, vocab, stats). The
    * census is NOT materialized here: the token census is small enough
    * that recomputation per consumer beats an eager checkpoint
    * (A/B-measured at sf0.1: +36% with the cut) — unlike the n-gram
    * census in [[phraseIndexFrames]], where the cut wins 2×. */
  def indexFrames(docs: DataFrame, textCol: String, idCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val post = postings(docs, textCol, idCol)
    val dl = post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val vocab = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    (post, dl, vocab, stats)
  }

  /** The standing query set: the corpus's 2·q head terms by
    * (df desc, term asc), paired off into q two-term conjunctive
    * queries — (query_id, term, q_n).
    *
    * The head cut is a distributed `orderBy(...).limit(2q)` — Spark's
    * TakeOrderedAndProject: each partition keeps its local top-2q and
    * only 2q·partitions rows move (the [[Bpe]] trainer idiom,
    * Bpe.scala's capped census). The `row_number` window that assigns
    * query ids then runs over the ≤2q-row cut ONLY — the full
    * vocabulary (~10⁸ terms at 100 TB) never funnels through a
    * single-partition global window. The ordering is total (term is
    * unique in vocab), so the cut + renumber is value-identical to
    * numbering the whole vocabulary and keeping rn ≤ 2q. */
  def headTermQueries(vocab: DataFrame, q: Int): DataFrame = {
    val head = vocab.orderBy(col("df").desc, col("term").asc).limit(q * 2)
    val w = Window.orderBy(col("df").desc, col("term").asc)
    head.withColumn("rn", row_number().over(w))
      .select(expr("(rn + 1) div 2").cast("int").as("query_id"),
        col("term"), lit(2).as("q_n"))
  }

  /** Conjunctive BM25 top-k over index frames. `queries` = (query_id,
    * term, q_n). Output: (query_id, rnk, doc_id, score). */
  def searchFrames(post: DataFrame, dl: DataFrame, vocab: DataFrame,
                   stats: DataFrame, queries: DataFrame, k: Int): DataFrame =
    searchFramesMode(post, dl, vocab, stats, queries, k, conjunctive = true)

  /** Disjunctive (OR) variant: any doc containing ANY query term
    * qualifies; missing terms simply contribute nothing to the exact
    * decimal sum. Same candidate plan — the conjunctive/disjunctive
    * split is only the post-aggregation match filter. */
  def searchFramesOr(post: DataFrame, dl: DataFrame, vocab: DataFrame,
                     stats: DataFrame, queries: DataFrame, k: Int): DataFrame =
    searchFramesMode(post, dl, vocab, stats, queries, k, conjunctive = false)

  private def searchFramesMode(post: DataFrame, dl: DataFrame, vocab: DataFrame,
      stats: DataFrame, queries: DataFrame, k: Int,
      conjunctive: Boolean): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val cand = post.join(queries, "term")
      .join(vocab, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5) + 1.0))
      .withColumn("contrib_raw",
        col("idf") * (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / col("avgdl"))))
      // rule 5b: quantize per-term, then sum EXACT decimals so the
      // per-doc score is term-order-free in both engines
      .withColumn("contrib_d", col("contrib_raw").cast("decimal(18,9)"))
    val grouped = cand
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_match"), max(col("q_n")).as("q_n"),
        sum(col("contrib_d")).as("score_d"))
    val scored =
      if (conjunctive) grouped.filter(col("n_match") === col("q_n"))
      else grouped
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_d").desc, col("doc_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        Similarity.decToDouble(col("score_d")).as("score"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** One-shot in-memory search: head-term queries over a fresh index
    * of `docs`. */
  def search(docs: DataFrame, textCol: String, idCol: String,
             q: Int, k: Int): DataFrame = {
    val (post, dl, vocab, stats) = indexFrames(docs, textCol, idCol)
    searchFrames(post, dl, vocab, stats, headTermQueries(vocab, q), k)
  }

  /** Standing phrase queries: the q most document-frequent phrases,
    * one phrase per query (q_n = 1). Head cut is the distributed
    * TakeOrdered (see [[headTermQueries]]) — critical here because the
    * shingle "vocabulary" is near corpus-cardinality: a global window
    * over it would move the whole census to one task. */
  def headPhraseQueries(vocab: DataFrame, q: Int): DataFrame = {
    val head = vocab.orderBy(col("df").desc, col("term").asc).limit(q)
    val w = Window.orderBy(col("df").desc, col("term").asc)
    head.withColumn("rn", row_number().over(w))
      .select(col("rn").cast("int").as("query_id"),
        col("term"), lit(1).as("q_n"))
  }

  /** One-shot phrase search — the SHINGLE-index answer to phrase
    * queries (the Elasticsearch shingle-filter / Google n-gram
    * posture): contiguous n-grams are scored AS TERMS by the exact
    * [[searchFrames]] BM25 kernel (tf = phrase occurrences, df over
    * phrase-containing docs, dl = the doc's shingle count), with
    * adjacency guaranteed by the n-gram window at derivation time,
    * never re-verified per query.
    *
    * Build shape (r15, VERDICT task 5): the shingle census is
    * near-CORPUS-cardinality, so nothing census-sized is ever
    * materialized —
    *  - dl/stats come from token counts alone (a doc's shingle total
    *    is `len − n + 1` by construction; docs shorter than n carry
    *    none and drop out, mirrored by the oracle);
    *  - the head-query cut runs the census as ONE aggregation
    *    pipeline ending in a distributed TakeOrdered q-row cut;
    *  - postings materialize ONLY for the q standing phrases — the
    *    tiny query set broadcasts, so the corpus side filters
    *    map-side inside the join with no corpus shuffle.
    * The old build checkpointed the full census (~corpus rows to
    * executor storage; 10× rehearsal ratio 2.28); this one's biggest
    * intermediate is q rows. */
  def searchPhrase(docs: DataFrame, textCol: String, idCol: String,
      q: Int, k: Int, n: Int = 2): DataFrame = {
    val shingles = docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.ops.Text.tokens(col(textCol)).as("ts"))
      .select(col("doc_id"),
        explode(graft.ops.Text.ngramsAll(col("ts"), n)).as("term"))
    val dfreq = shingles
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val head = dfreq.orderBy(col("df").desc, col("term").asc).limit(q)
    val w = Window.orderBy(col("df").desc, col("term").asc)
    // q rows; reused as the standing-query set, the vocab side, and
    // the postings filter — checkpointed so the census aggregation
    // upstream runs exactly once
    val queries = head.withColumn("rn", row_number().over(w))
      .select(col("rn").cast("int").as("query_id"),
        col("term"), lit(1).as("q_n"), col("df"))
      .checkpointLinted()
    val post = shingles
      .join(broadcast(queries.select(col("term"))), "term")
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val dl = docs.select(col(idCol).cast("long").as("doc_id"),
        (size(graft.ops.Text.tokens(col(textCol))) - lit(n - 1))
          .cast("long").as("dl"))
      .filter(col("dl") >= 1)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    searchFrames(post, dl, queries.select(col("term"), col("df")), stats,
      queries.drop("df"), k)
  }

  /** One-shot disjunctive (OR) search. */
  def searchOr(docs: DataFrame, textCol: String, idCol: String,
               q: Int, k: Int): DataFrame = {
    val (post, dl, vocab, stats) = indexFrames(docs, textCol, idCol)
    searchFramesOr(post, dl, vocab, stats, headTermQueries(vocab, q), k)
  }

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    * the standard lexical+prior combiner) of the conjunctive BM25
    * ranking with a QUERY-INDEPENDENT document prior — here the
    * stopword-density quality proxy ([[Text.stopwordCount]] over
    * [[Text.langMarkers]]("en"), the q_text_quality axis), the
    * "static rank" a search stack fuses with relevance. Per system
    * the contribution is 1/(k0 + rank); both contributions quantize
    * to DECIMAL(18,9) (rule 5b) and sum EXACTLY, so the fused
    * ordering is engine-identical. The prior is ranked WITHIN each
    * query's candidate set (depth-bounded), so the fusion plan is
    * candidate-sized — the corpus contributes one projection for the
    * prior columns and never shuffles. */
  def searchHybridRrf(docs: DataFrame, textCol: String, idCol: String,
                      q: Int, k: Int, depth: Int = 20, k0: Int = 60): DataFrame = {
    val (post, dl, vocab, stats) = indexFrames(docs, textCol, idCol)
    val bm25 = searchFrames(post, dl, vocab, stats,
      headTermQueries(vocab, q), depth)
    val prior = docs.select(col(idCol).cast("long").as("doc_id"),
      (Text.stopwordCount(col(textCol), Text.langMarkers("en")).cast("double") /
        size(Text.tokens(col(textCol))).cast("double")).as("stop_ratio"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("stop_ratio").desc, col("doc_id").asc)
    val fused = bm25.join(prior, "doc_id")
      .withColumn("prnk", row_number().over(wp))
      .withColumn("c_bm",
        (lit(1.0) / (lit(k0).cast("double") + col("rnk").cast("double")))
          .cast("decimal(18,9)"))
      .withColumn("c_pr",
        (lit(1.0) / (lit(k0).cast("double") + col("prnk").cast("double")))
          .cast("decimal(18,9)"))
      .withColumn("rrf_d", col("c_bm") + col("c_pr"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_d").desc, col("doc_id").asc)
    fused.withColumn("frnk", row_number().over(wf)).filter(col("frnk") <= k)
      .select(col("query_id"), col("frnk").cast("int").as("rnk"),
        col("doc_id"), Similarity.decToDouble(col("rrf_d")).as("rrf"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** PSEUDO-RELEVANCE-FEEDBACK semantic re-rank — the RAG serving
    * stack's lexical → vector cascade with a Rocchio-style probe:
    * conjunctive BM25 at `depth`, each query's rank-1 hit donates its
    * EMBEDDING as the probe ("more like the best match" — classic PRF,
    * public IR literature), every candidate re-scores by exact-decimal
    * cosine to the probe, and the lexical and semantic ranks fuse by
    * RRF (both 1/(k0+rank) contributions DECIMAL(18,9), summed
    * exactly — the [[searchHybridRrf]] discipline, so the fused order
    * is engine-identical).
    *
    * Scale shape: the BM25 stage is the pruned-index plan; embeddings
    * enter ONLY through a candidate-sized join (q·depth ids pull their
    * vectors — at 100 TB that is a broadcast of the candidate ids
    * against the vector table's scan, never a corpus shuffle), and
    * the cosine/fusion windows are per-query candidate-sized. */
  def searchPrfRerank(docs: DataFrame, emb: DataFrame, textCol: String,
      idCol: String, vecIdCol: String, embCol: String,
      q: Int, k: Int, depth: Int = 20, k0: Int = 60): DataFrame = {
    val (post, dl, vocab, stats) = indexFrames(docs, textCol, idCol)
    val bm25 = searchFrames(post, dl, vocab, stats,
      headTermQueries(vocab, q), depth)
      .checkpointLinted() // q·depth rows, consumed twice below
    val ev = emb.select(col(vecIdCol).cast("long").as("doc_id"),
      col(embCol).as("v"))
    // a vector store rarely covers the whole corpus: the probe is the
    // BEST-RANKED candidate that has a vector, vector-less candidates
    // keep their lexical rank with zero semantic contribution, and a
    // query with no embedded candidate at all degrades to pure BM25
    val withV = bm25.join(ev, Seq("doc_id"), "left")
    val wp = Window.partitionBy(col("query_id")).orderBy(col("rnk").asc)
    val probes = withV.filter(col("v").isNotNull)
      .withColumn("prn", row_number().over(wp)).filter(col("prn") === 1)
      .select(col("query_id"), col("v").as("pv"))
    val scored = withV.join(broadcast(probes), Seq("query_id"), "left")
      .withColumn("cos",
        when(col("v").isNotNull && col("pv").isNotNull,
          Similarity.cosExact(col("v"), col("pv"),
            Similarity.norm2Decimal(col("v")),
            Similarity.norm2Decimal(col("pv")))))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("doc_id").asc)
    val fused = scored.withColumn("crnk", row_number().over(wc))
      .withColumn("c_bm",
        (lit(1.0) / (lit(k0).cast("double") + col("rnk").cast("double")))
          .cast("decimal(18,9)"))
      .withColumn("c_cs",
        when(col("cos").isNotNull,
          (lit(1.0) / (lit(k0).cast("double") + col("crnk").cast("double")))
            .cast("decimal(18,9)"))
          .otherwise(lit("0").cast("decimal(18,9)")))
      .withColumn("rrf_d", col("c_bm") + col("c_cs"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_d").desc, col("doc_id").asc)
    fused.withColumn("frnk", row_number().over(wf)).filter(col("frnk") <= k)
      .select(col("query_id"), col("frnk").cast("int").as("rnk"),
        col("doc_id"), Similarity.decToDouble(col("rrf_d")).as("rrf"),
        col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Oracle for [[searchPrfRerank]]: the conjunctive ranking at
    * `depth`, probe vectors from the rank-1 hits, every candidate
    * cosine replayed on the decimal grid (in-row list_sum folds — the
    * cosSql discipline), both RRF contributions hopped and summed
    * exactly. `embTable` must share the id domain with `table`. */
  def prfOracleSql(table: String, embTable: String, q: Int, k: Int,
                   depth: Int = 20, k0: Int = 60): String =
    oraclePrefix(table, q, conjunctive = true) +
      s""",
         cand AS MATERIALIZED (
           SELECT query_id, rnk, doc_id FROM ranked WHERE rnk <= $depth),
         gq AS MATERIALIZED (
           SELECT vec_id,
             [CAST(CAST(CAST(x AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) FOR x IN embedding] AS g
           FROM $embTable),
         gn AS MATERIALIZED (
           SELECT vec_id, g, list_sum([x * x FOR x IN g]) AS n2 FROM gq),
         probe AS MATERIALIZED (
           SELECT query_id, pg, pn2 FROM (
             SELECT c.query_id, e.g AS pg, e.n2 AS pn2,
               row_number() OVER (PARTITION BY c.query_id
                                  ORDER BY c.rnk ASC) AS prn
             FROM cand c JOIN gn e ON e.vec_id = c.doc_id) t
           WHERE prn = 1),
         cscore AS (
           SELECT c.query_id, c.rnk, c.doc_id,
             CASE WHEN e.vec_id IS NOT NULL AND p.query_id IS NOT NULL
               THEN CAST(CAST(list_sum([e.g[i] * p.pg[i]
                                        FOR i IN range(1, len(e.g) + 1)])
                 AS VARCHAR) AS DOUBLE) /
                 (sqrt(CAST(CAST(e.n2 AS VARCHAR) AS DOUBLE)) *
                  sqrt(CAST(CAST(p.pn2 AS VARCHAR) AS DOUBLE)))
               ELSE NULL END AS cos
           FROM cand c
           LEFT JOIN gn e ON e.vec_id = c.doc_id
           LEFT JOIN probe p ON p.query_id = c.query_id),
         cr AS (
           SELECT query_id, rnk, doc_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC NULLS LAST, doc_id ASC) AS crnk
           FROM cscore),
         prf_fused AS (
           SELECT query_id, doc_id, cos,
             CAST(CAST(1.0 / ($k0 + rnk) AS VARCHAR) AS DECIMAL(18,9)) +
             CASE WHEN cos IS NOT NULL
               THEN CAST(CAST(1.0 / ($k0 + crnk) AS VARCHAR) AS DECIMAL(18,9))
               ELSE CAST(0 AS DECIMAL(18,9)) END AS rrf_d
           FROM cr),
         prf_ranked AS (
           SELECT query_id, doc_id, cos, rrf_d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_d DESC, doc_id ASC) AS frnk
           FROM prf_fused)
         SELECT query_id, CAST(frnk AS INT) AS rnk, doc_id,
           CAST(CAST(rrf_d AS VARCHAR) AS DOUBLE) AS rrf, cos
         FROM prf_ranked WHERE frnk <= $k
         ORDER BY query_id, rnk"""

  // ---------------------------------------------------------------
  // Persisted artifact
  // ---------------------------------------------------------------

  private def shardCol: Column = pmod(xxhash64(col("term")), lit(Shards))

  /** Write one batch of the index (batch 0 = initial build). */
  def writeSearchIndex(docs: DataFrame, textCol: String, idCol: String,
                       path: String, batch: Int = 0): Unit = {
    val (post, dl, vocab, stats) = indexFrames(docs, textCol, idCol)
    // four independent family writes to disjoint dirs (each recomputes
    // the lazy postings plan — the A/B-measured posture above): overlap
    // them (guide §2.6) instead of running the four recomputations
    // back-to-back
    graft.tools.Par.run(4)(Seq(
      () => post.withColumn("shard", shardCol)
        .repartition(col("shard"))
        .write.partitionBy("shard").mode("overwrite")
        .parquet(s"$path/postings/batch=$batch"),
      () => dl.write.mode("overwrite").parquet(s"$path/doclen/batch=$batch"),
      () => vocab.write.mode("overwrite").parquet(s"$path/vocab/batch=$batch"),
      () => stats.write.mode("overwrite").parquet(s"$path/stats/batch=$batch")))
    ()
  }

  /** Append a DISJOINT doc batch — df/stats additivity does the merge
    * at read time; no prior-batch rescan. */
  def appendSearchIndex(docs: DataFrame, textCol: String, idCol: String,
                        path: String, batch: Int): Unit =
    writeSearchIndex(docs, textCol, idCol, path, batch)

  /** EPOCH COMPACTION for a streamed search index
    * ([[graft.streaming.DocStreams.searchIndexIngest]] accumulates one
    * `batch=K` family per micro-batch): fold every family into a
    * single fresh `batch=-1` epoch in place — the search twin of
    * [[Dedup.compactDedupIndex]]. Batches hold DISJOINT doc sets, so
    * postings/doclen rows merge unchanged while df and the corpus
    * stats re-aggregate additively; the compacted index serves
    * bit-identical scores (asserted in `RetrievalSpec`) with the
    * per-batch file accumulation gone. Each family commits via the
    * write-then-rename swap, and the postings epoch keeps the
    * term-shard partitioning so query-time pruning is unchanged. */
  def compactSearchIndex(spark: SparkSession, path: String): Unit = {
    // the four families compact independently (disjoint dirs, one
    // read→write→swap each): overlap them (guide §2.6) — same swaps,
    // same resulting epochs
    graft.tools.Par.run(4)(Seq(
      () => {
        val fam = s"$path/postings"
        val tmp = s"$fam.compact"
        spark.read.parquet(fam).drop("batch")
          .repartition(col("shard"))
          .write.partitionBy("shard").mode("overwrite").parquet(s"$tmp/batch=-1")
        graft.io.Fs.replaceDir(spark, tmp, fam)
      },
      () => Dedup.compactFamily(spark, s"$path/doclen")(identity),
      () => Dedup.compactFamily(spark, s"$path/vocab")(v =>
        v.groupBy(col("term")).agg(sum(col("df")).as("df"))),
      () => Dedup.compactFamily(spark, s"$path/stats")(s =>
        s.agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl")))))
    ()
  }

  /** The artifact's postings scan for a term set: filtered to the
    * terms' shards (partition-pruned — asserted in `RetrievalSpec`)
    * and the terms themselves (parquet row-group pushdown). Split out
    * so the spec can read the un-checkpointed plan. */
  def prunedPostingsFrame(spark: SparkSession, path: String,
                          terms: Seq[String]): DataFrame = {
    // shard ids through the SAME engine expression the writer used —
    // a term-count-sized local frame, no internal-API hash replication
    import spark.implicits._
    val shards = terms.toDF("term").select(shardCol.as("s"))
      .distinct().collect().map(_.getLong(0)).toSeq
    spark.read.parquet(s"$path/postings")
      .filter(col("shard").isin(shards: _*) && col("term").isin(terms: _*))
      .drop("shard", "batch")
  }

  /** Head-term conjunctive BM25 top-k served from the artifact. The
    * postings scan is filtered to the query terms (and their shards —
    * partition-pruned); vocab/stats/doclen are the only other reads. */
  def searchIndexed(spark: SparkSession, path: String,
                    q: Int, k: Int): DataFrame = {
    val vocab = spark.read.parquet(s"$path/vocab")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val queries = headTermQueries(vocab, q).cache()
    val terms = queries.select(col("term")).collect().map(_.getString(0)).toSeq
    val post = prunedPostingsFrame(spark, path, terms)
    val dl = spark.read.parquet(s"$path/doclen").drop("batch")
    val stats = spark.read.parquet(s"$path/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val out = searchFrames(post, dl, vocab, stats, queries, k)
      .checkpointLinted()
    queries.unpersist()
    out
  }

  // ---------------------------------------------------------------
  // DuckDB oracle — the from-scratch replay every artifact path must
  // land on (same tokenization, same head-term query derivation, same
  // quantized-contribution BM25).
  // ---------------------------------------------------------------

  def searchOracleSql(table: String, q: Int, k: Int): String =
    oraclePrefix(table, q, conjunctive = true) +
      s"""
         SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id,
           CAST(CAST(score_d AS VARCHAR) AS DOUBLE) AS score
         FROM ranked WHERE rnk <= $k
         ORDER BY query_id, rnk"""

  /** Oracle for [[searchOr]]: the conjunctive HAVING removed. */
  def searchOrOracleSql(table: String, q: Int, k: Int): String =
    oraclePrefix(table, q, conjunctive = false) +
      s"""
         SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id,
           CAST(CAST(score_d AS VARCHAR) AS DOUBLE) AS score
         FROM ranked WHERE rnk <= $k
         ORDER BY query_id, rnk"""

  /** Oracle for [[searchHybridRrf]]: the conjunctive ranking at
    * `depth`, the stopword-density prior re-ranked within each
    * query's candidates, both reciprocal-rank contributions
    * VARCHAR-hopped to DECIMAL(18,9) and summed exactly. */
  def hybridOracleSql(table: String, q: Int, k: Int,
                      depth: Int = 20, k0: Int = 60): String =
    oraclePrefix(table, q, conjunctive = true) +
      s""",
         prior AS (
           SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text),
                 '\\b(the|and|of|to|in|is|data|table)\\b')) AS DOUBLE) /
               CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE)
               AS stop_ratio
           FROM $table),
         cand AS (
           SELECT r.query_id, r.rnk, r.doc_id, p.stop_ratio
           FROM ranked r JOIN prior p USING (doc_id)
           WHERE r.rnk <= $depth),
         pranked AS (
           SELECT query_id, rnk, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY stop_ratio DESC, doc_id ASC) AS prnk
           FROM cand),
         fused AS (
           SELECT query_id, doc_id,
             CAST(CAST(1.0 / ($k0 + rnk) AS VARCHAR) AS DECIMAL(18,9)) +
             CAST(CAST(1.0 / ($k0 + prnk) AS VARCHAR) AS DECIMAL(18,9)) AS rrf_d
           FROM pranked),
         franked AS (
           SELECT query_id, doc_id, rrf_d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_d DESC, doc_id ASC) AS frnk
           FROM fused)
         SELECT query_id, CAST(frnk AS INT) AS rnk, doc_id,
           CAST(CAST(rrf_d AS VARCHAR) AS DOUBLE) AS rrf
         FROM franked WHERE frnk <= $k
         ORDER BY query_id, rnk"""

  /** Shared oracle CTE chain through `ranked` (full per-query
    * ranking; callers cut at their own depth/k). */
  /** Oracle for [[searchPhrase]] at n = 2: the bigram (shingle) census
    * replaces the token census — every downstream CTE (dl, df, stats,
    * head-query cut, quantized BM25, ranking) is the term replay
    * verbatim with q_n = 1. */
  def phraseOracleSql(table: String, q: Int, k: Int): String =
    s"""WITH toks AS (
           SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
           FROM $table),
         pairs AS (
           SELECT doc_id, t[i] || ' ' || t[i + 1] AS term
           FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
                 FROM toks WHERE len(t) >= 2)),
         tf AS (
           SELECT doc_id, term, count(1) AS tf FROM pairs GROUP BY doc_id, term),
         dl AS (
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         dfreq AS (
           SELECT term, count(1) AS df FROM tf GROUP BY term),
         stats AS (
           SELECT CAST(count(1) AS BIGINT) AS n_docs,
                  CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         qterms AS (
           SELECT CAST(rn AS INT) AS query_id, term, 1 AS q_n FROM (
             SELECT term,
               row_number() OVER (ORDER BY df DESC, term ASC) AS rn
             FROM dfreq) WHERE rn <= $q),
         contrib AS (
           SELECT qt.query_id, tf.doc_id, qt.q_n,
             CAST(CAST(
               ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(tf.tf AS DOUBLE) +
                    1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) /
                      (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
               AS VARCHAR) AS DECIMAL(18,9)) AS contrib_d
           FROM tf
           JOIN qterms qt USING (term)
           JOIN dfreq USING (term)
           JOIN dl USING (doc_id)
           CROSS JOIN stats),
         scored AS (
           SELECT query_id, doc_id, sum(contrib_d) AS score_d
           FROM contrib
           GROUP BY query_id, doc_id, q_n
           HAVING count(1) = q_n),
         ranked AS (
           SELECT query_id, doc_id, score_d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_d DESC, doc_id ASC) AS rnk
           FROM scored)
         SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id,
           CAST(CAST(score_d AS VARCHAR) AS DOUBLE) AS score
         FROM ranked WHERE rnk <= $k
         ORDER BY query_id, rnk"""

  private def oraclePrefix(table: String, q: Int, conjunctive: Boolean): String =
    s"""WITH toks AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
           FROM $table),
         tf AS (
           SELECT doc_id, term, count(1) AS tf FROM toks GROUP BY doc_id, term),
         dl AS (
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         dfreq AS (
           SELECT term, count(1) AS df FROM tf GROUP BY term),
         stats AS (
           SELECT CAST(count(1) AS BIGINT) AS n_docs,
                  CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         qsel AS (
           SELECT term, rn FROM (
             SELECT term,
               row_number() OVER (ORDER BY df DESC, term ASC) AS rn
             FROM dfreq) WHERE rn <= ${q * 2}),
         qterms AS (
           SELECT CAST((rn + 1) // 2 AS INT) AS query_id, term, 2 AS q_n
           FROM qsel),
         contrib AS (
           SELECT qt.query_id, tf.doc_id, qt.q_n,
             CAST(CAST(
               ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                    (CAST(df AS DOUBLE) + 0.5) + 1.0)
                 * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(tf.tf AS DOUBLE) +
                    1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) /
                      (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
               AS VARCHAR) AS DECIMAL(18,9)) AS contrib_d
           FROM tf
           JOIN qterms qt USING (term)
           JOIN dfreq USING (term)
           JOIN dl USING (doc_id)
           CROSS JOIN stats),
         scored AS (
           SELECT query_id, doc_id, sum(contrib_d) AS score_d
           FROM contrib
           GROUP BY query_id, doc_id, q_n
           ${if (conjunctive) "HAVING count(1) = q_n" else ""}),
         ranked AS (
           SELECT query_id, doc_id, score_d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_d DESC, doc_id ASC) AS rnk
           FROM scored)"""
}
