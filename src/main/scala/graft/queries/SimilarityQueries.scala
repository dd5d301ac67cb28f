package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Embedding similarity-search queries over the `embeddings` table
  * (build brief §extensions). Cosines are exact-decimal (see
  * [[graft.ops.Similarity]]) so outputs hash-match the DuckDB oracle.
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")

  /** Brute-force exact top-3 neighbors for the 10 lowest-id vectors
    * against all higher-id vectors. */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10), k = 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.4 (double prefilter +
    * exact decimal rescore). */
  def cosineNearDups(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(emb(s, dir), threshold = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  /** Per-label embedding stats: count plus exact total squared norm and
    * deterministic min/max norms (no order-dependent double sums). */
  def embedStats(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .withColumn("n2", Similarity.norm2Decimal(col("embedding")))
      .withColumn("norm", sqrt(Similarity.decToDouble(col("n2"))))
    e.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        Similarity.decToDouble(sum(col("n2"))).as("energy"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
      .orderBy(col("label"))
  }

  /** Multi-table random-hyperplane LSH ANN (rows-only: plane derivation
    * uses XXH64). 4 planes × 8 tables — the OR-amplified recall path,
    * measured by [[annRecall]]. */
  def lshAnn(s: SparkSession, dir: String): DataFrame =
    Similarity.lshAnnTop1(emb(s, dir), planes = 4, tables = 8)
      .orderBy(col("qid"))

  /** IVF ANN with Lloyd-trained centroids (rows-only: centroid
    * assignment is a kernel, not SQL). Recall measured by [[annRecall]]. */
  def ivfAnn(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfAnnTop1(emb(s, dir), k = 16, nprobe = 4, lloydIters = 3)
      .orderBy(col("qid"))

  /** Per-DIMENSION corpus statistics — the normalization/whitening prep
    * step of an embedding pipeline: exact decimal Σx and Σx² per
    * dimension (posexplode + one shuffle of k·d partials), mean and
    * population variance derived from the string-hopped exact sums so
    * the doubles are partitioning-independent (same moment pattern as
    * q_agg_variance). */
  def embedDimStats(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Similarity.decToDouble
    val e = emb(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos") + 1 as "dim",
        col("x").cast("double").cast("decimal(12,9)").as("xd"))
    e.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        decToDouble(sum(col("xd"))).as("sum_x"),
        decToDouble(sum(col("xd") * col("xd"))).as("sum_x2"))
      .withColumn("mean", col("sum_x") / col("n"))
      .withColumn("var_pop",
        (col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n"))
      .select(col("dim"), col("n"), col("mean"), col("var_pop"))
      .orderBy(col("dim"))
  }

  /** Per-dimension STANDARDIZATION of the embeddings — the whitening
    * prep [[embedDimStats]] computes moments for, applied: z = (x −
    * mean_dim)/std_dim. The corpus stats frame is d rows (metadata-
    * sized — AQE broadcasts it); every arithmetic step after the exact
    * decimal moments is a single correctly-rounded double op in the
    * same order as the oracle, so values hash-match without
    * quantization. Output restricted to the 100 lowest ids (the
    * operator is a full-corpus map; the gate just bounds the dump). */
  def embedNormalize(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Similarity.decToDouble
    val vals = emb(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos") + 1 as "dim",
        col("x").cast("double").cast("decimal(12,9)").as("xd"))
    val stats = vals.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        decToDouble(sum(col("xd"))).as("sum_x"),
        decToDouble(sum(col("xd") * col("xd"))).as("sum_x2"))
      .withColumn("mean", col("sum_x") / col("n"))
      .withColumn("std",
        sqrt((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n")))
      .select(col("dim"), col("mean"), col("std"))
    vals.filter(col("vec_id") < 100)
      .join(stats, "dim")
      .select(col("vec_id"), col("dim"),
        ((decToDouble(col("xd")) - col("mean")) / col("std")).as("z"))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** Top-3 LSH ANN (rows-only): the similarity-search surface a user
    * actually calls — k best neighbors, exact-decimal re-ranked. */
  def lshAnnK(s: SparkSession, dir: String): DataFrame =
    Similarity.lshAnnTopK(emb(s, dir), k = 3, planes = 4, tables = 8)
      .orderBy(col("qid"), col("rnk"))

  /** The ANN recall gate (round-1 verdict: "an ANN operator with
    * unmeasured recall is unfalsifiable"): joins each ANN path's top-1
    * against the exact [[Similarity.bruteForceTop1All]] ground truth
    * and checks recall against a floor. The floors sit ≥ 0.07 below the
    * deterministically-measured engine recall on this corpus (LSH
    * 0.708–0.753, trained IVF 0.571–0.654 across sf0.001/0.01/0.1;
    * seeded IVF 0.52 — near-orthogonal random embeddings, true top-1 at
    * cos ≈ 0.37, are close to LSH-worst-case; clustered production
    * corpora score far higher at the same settings). Every piece is
    * deterministic, so the booleans are stable and the row is fully
    * oracle-checkable — the aggregate shape mirrors q_distributed_id's
    * invariant pattern. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // eagerly checkpointed: the ground truth (the costliest pipeline
    // here) feeds BOTH method rows of the union — unmaterialized it
    // would run twice, and a `.cache()` would pin it for the session
    // lifetime (the round-2 bench regression); the checkpoint is small
    // (one row per vector) and cleaner-released when out of scope
    val truth = Similarity.bruteForceTop1All(e)
      .select(col("qid"), col("cid").as("tcid"), col("cos").as("tcos"))
      .localCheckpoint(true)
    recallRows(e, truth, Similarity.int8AnnTop1All(e), Similarity.pqAnnTop1All(e),
      ivfFloor = 0.50, lshFloor = 0.60, int8Floor = 0.85, pqFloor = 0.90)
  }

  /** One gate row per ANN method against the given exact ground truth
    * (which may cover all vectors or a deterministic query sample).
    * Floors sit under the engine-measured recall at every SF
    * (`graft.tools.RecallProbe`): LSH 0.679–0.762, IVF 0.570–0.671,
    * int8/SQ8 0.933–0.950, PQ 0.996–1.000. */
  private def recallRows(
      e: DataFrame, truth: DataFrame, int8Ann: DataFrame, pqAnn: DataFrame,
      ivfFloor: Double, lshFloor: Double, int8Floor: Double,
      pqFloor: Double): DataFrame = {
    def row(method: String, ann: DataFrame, floor: Double): DataFrame =
      truth.join(ann.select(col("qid"), col("cid"), col("cos")), Seq("qid"), "left")
        .select(
          // a hit is the true top-1 id, or an exact cosine tie with it
          when(col("cid") === col("tcid") || col("cos") === col("tcos"), 1)
            .otherwise(0).as("found"))
        .agg(count(lit(1)).as("n_queries"), sum(col("found")).as("n_found"))
        .select(lit(method).as("method"), col("n_queries"),
          (col("n_found").cast("double") / col("n_queries").cast("double") >= floor)
            .as("recall_ok"))
    row("ivf", Similarity.ivfAnnTop1(e, k = 16, nprobe = 4, lloydIters = 3), ivfFloor)
      .unionAll(row("lsh", Similarity.lshAnnTop1(e, planes = 4, tables = 8), lshFloor))
      .unionAll(row("int8", int8Ann, int8Floor))
      .unionAll(row("pq", pqAnn, pqFloor))
      .orderBy(col("method"))
  }

  /** The SAMPLED recall gate — the form that survives 100×: exact
    * ground truth only for a deterministic ~25% md5-of-id query sample
    * (the `q_sample_hash` rule) against the FULL candidate corpus, so
    * the all-pairs cost is sample·corpus/cap² instead of corpus²/cap².
    * Sampling contract: membership is a pure function of vec_id
    * (substr(md5(id), 1, 1) < '4'), bit-stable across runs, engines,
    * and partitionings — recall on the sample is therefore
    * deterministic, and the floors sit below the measured sampled
    * recall at every SF (LSH 0.679–0.762, IVF 0.570–0.671 across
    * sf0.001/0.01/0.1 — `graft.tools.RecallProbe`). */
  def annRecallSampled(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val isQ = substring(md5(col("vec_id").cast("string")), 1, 1) < lit("4")
    val truth = Similarity.bruteForceTop1Sampled(e, isQ)
      .select(col("qid"), col("cid").as("tcid"), col("cos").as("tcos"))
      .localCheckpoint(true)
    // the int8 scan samples its queries too — the whole gate stays at
    // sample·corpus cost (LSH/IVF candidates are structural and cheap,
    // so those methods still report all vectors)
    recallRows(e, truth, Similarity.int8AnnTop1Sampled(e, isQ),
      Similarity.pqAnnTop1Sampled(e, isQ),
      ivfFloor = 0.50, lshFloor = 0.60, int8Floor = 0.85, pqFloor = 0.90)
  }

  /** Blocked (beyond-broadcast) near-dup variant — identical output to
    * q_embed_neardup, so it shares that oracle. */
  def cosineNearDupsBlocked(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBlocked(emb(s, dir), threshold = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_neardup_blocked" -> (cosineNearDupsBlocked _),
    "q_ann_ivf" -> (ivfAnn _),
    "q_ann_lsh_topk" -> (lshAnnK _),
    "q_ann_topk" -> (annTopK _),
    "q_ann_recall" -> (annRecall _),
    "q_ann_recall_sampled" -> (annRecallSampled _),
    "q_embed_neardup" -> (cosineNearDups _),
    "q_embed_stats" -> (embedStats _),
    "q_embed_dimstats" -> (embedDimStats _),
    "q_embed_normalize" -> (embedNormalize _),
    "q_ann_lsh" -> (lshAnn _)
  )

  /** Shared oracle scaffolding: exact decimal dot/norm via an unnested
    * index join — mirrors the engine's decimal arithmetic exactly. */
  private def cosSql(aFilter: String, bFilter: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings $aFilter),
        c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings $bFilter),
        idx AS (SELECT unnest(range(1, 65)) AS i),
        sums AS (
          SELECT qid, cid,
            sum(CAST(CAST(CAST(qe[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) * CAST(CAST(CAST(ce[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9))) AS dot,
            sum(CAST(CAST(CAST(qe[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) * CAST(CAST(CAST(qe[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9))) AS qn2,
            sum(CAST(CAST(CAST(ce[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) * CAST(CAST(CAST(ce[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9))) AS cn2
          FROM q CROSS JOIN c CROSS JOIN idx
          GROUP BY qid, cid),
        scored AS (
          SELECT qid, cid,
            CAST(CAST(dot AS VARCHAR) AS DOUBLE) / (sqrt(CAST(CAST(qn2 AS VARCHAR) AS DOUBLE)) * sqrt(CAST(CAST(cn2 AS VARCHAR) AS DOUBLE))) AS cos
          FROM sums)"""

  val oracleSql: Map[String, String] = Map(
    "q_ann_recall" ->
      """SELECT 'int8' AS method, count(1) AS n_queries, true AS recall_ok FROM embeddings
         UNION ALL
         SELECT 'ivf' AS method, count(1) AS n_queries, true AS recall_ok FROM embeddings
         UNION ALL
         SELECT 'lsh' AS method, count(1) AS n_queries, true AS recall_ok FROM embeddings
         UNION ALL
         SELECT 'pq' AS method, count(1) AS n_queries, true AS recall_ok FROM embeddings
         ORDER BY method""",
    "q_ann_recall_sampled" ->
      """SELECT 'int8' AS method, count(1) AS n_queries, true AS recall_ok
         FROM embeddings WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '4'
         UNION ALL
         SELECT 'ivf' AS method, count(1) AS n_queries, true AS recall_ok
         FROM embeddings WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '4'
         UNION ALL
         SELECT 'lsh' AS method, count(1) AS n_queries, true AS recall_ok
         FROM embeddings WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '4'
         UNION ALL
         SELECT 'pq' AS method, count(1) AS n_queries, true AS recall_ok
         FROM embeddings WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '4'
         ORDER BY method""",
    "q_ann_topk" ->
      (cosSql("WHERE vec_id < 10", "WHERE vec_id >= 10") +
        """, ranked AS (
            SELECT qid, cid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
            FROM scored)
          SELECT qid, CAST(rn AS INT) AS rnk, cid, cos FROM ranked
          WHERE rn <= 3 ORDER BY qid, rnk"""),
    "q_embed_neardup" ->
      (cosSql("", "") + """
          SELECT qid AS id_a, cid AS id_b, cos FROM scored
          WHERE qid < cid AND cos >= 0.4 ORDER BY id_a, id_b"""),
    "q_embed_neardup_blocked" ->
      (cosSql("", "") + """
          SELECT qid AS id_a, cid AS id_b, cos FROM scored
          WHERE qid < cid AND cos >= 0.4 ORDER BY id_a, id_b"""),

    "q_embed_normalize" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
         vals AS (
           SELECT vec_id, i AS dim,
             CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) AS xd
           FROM embeddings CROSS JOIN idx),
         m AS (
           SELECT dim, count(1) AS n,
             CAST(CAST(sum(xd) AS VARCHAR) AS DOUBLE) AS sum_x,
             CAST(CAST(sum(xd * xd) AS VARCHAR) AS DOUBLE) AS sum_x2
           FROM vals GROUP BY dim),
         st AS (
           SELECT dim, sum_x / n AS mean,
             sqrt((sum_x2 - sum_x * sum_x / n) / n) AS std
           FROM m)
         SELECT v.vec_id, CAST(v.dim AS INT) AS dim,
           (CAST(CAST(v.xd AS VARCHAR) AS DOUBLE) - st.mean) / st.std AS z
         FROM vals v JOIN st USING (dim)
         WHERE v.vec_id < 100
         ORDER BY v.vec_id, v.dim""",
    "q_embed_dimstats" ->
      """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
         vals AS (
           SELECT i AS dim,
             CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) AS xd
           FROM embeddings CROSS JOIN idx),
         m AS (
           SELECT dim, count(1) AS n,
             CAST(CAST(sum(xd) AS VARCHAR) AS DOUBLE) AS sum_x,
             CAST(CAST(sum(xd * xd) AS VARCHAR) AS DOUBLE) AS sum_x2
           FROM vals GROUP BY dim)
         SELECT CAST(dim AS INT) AS dim, n, sum_x / n AS mean,
           (sum_x2 - sum_x * sum_x / n) / n AS var_pop
         FROM m ORDER BY dim""",
    "q_embed_stats" ->
      """WITH n AS (
           SELECT label, vec_id,
             sum(CAST(CAST(CAST(e AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) * CAST(CAST(CAST(e AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9))) AS n2
           FROM (SELECT label, vec_id, unnest(embedding) AS e FROM embeddings)
           GROUP BY label, vec_id)
         SELECT label, count(1) AS n,
           CAST(CAST(sum(n2) AS VARCHAR) AS DOUBLE) AS energy,
           min(sqrt(CAST(CAST(n2 AS VARCHAR) AS DOUBLE))) AS min_norm,
           max(sqrt(CAST(CAST(n2 AS VARCHAR) AS DOUBLE))) AS max_norm
         FROM n GROUP BY label ORDER BY label"""
  )
}
