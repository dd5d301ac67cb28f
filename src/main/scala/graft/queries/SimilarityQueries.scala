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

  /** Random-hyperplane LSH bucketed ANN (rows-only: plane derivation
    * uses xxhash64). The scale path: candidate sets shrink by ~2^planes. */
  def lshAnn(s: SparkSession, dir: String): DataFrame =
    Similarity.lshAnnTop1(emb(s, dir), planes = 6)
      .orderBy(col("qid"))

  /** IVF-style coarse-quantized ANN (rows-only: centroid assignment is
    * a kernel, not SQL). */
  def ivfAnn(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfAnnTop1(emb(s, dir), k = 16, nprobe = 2)
      .orderBy(col("qid"))

  /** Blocked (beyond-broadcast) near-dup variant — identical output to
    * q_embed_neardup, so it shares that oracle. */
  def cosineNearDupsBlocked(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBlocked(emb(s, dir), threshold = 0.4)
      .orderBy(col("id_a"), col("id_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_neardup_blocked" -> (cosineNearDupsBlocked _),
    "q_ann_ivf" -> (ivfAnn _),
    "q_ann_topk" -> (annTopK _),
    "q_embed_neardup" -> (cosineNearDups _),
    "q_embed_stats" -> (embedStats _),
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
            sum(CAST(CAST(qe[i] AS DOUBLE) AS DECIMAL(12,9)) * CAST(CAST(ce[i] AS DOUBLE) AS DECIMAL(12,9))) AS dot,
            sum(CAST(CAST(qe[i] AS DOUBLE) AS DECIMAL(12,9)) * CAST(CAST(qe[i] AS DOUBLE) AS DECIMAL(12,9))) AS qn2,
            sum(CAST(CAST(ce[i] AS DOUBLE) AS DECIMAL(12,9)) * CAST(CAST(ce[i] AS DOUBLE) AS DECIMAL(12,9))) AS cn2
          FROM q CROSS JOIN c CROSS JOIN idx
          GROUP BY qid, cid),
        scored AS (
          SELECT qid, cid,
            CAST(CAST(dot AS VARCHAR) AS DOUBLE) / (sqrt(CAST(CAST(qn2 AS VARCHAR) AS DOUBLE)) * sqrt(CAST(CAST(cn2 AS VARCHAR) AS DOUBLE))) AS cos
          FROM sums)"""

  val oracleSql: Map[String, String] = Map(
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

    "q_embed_stats" ->
      """WITH n AS (
           SELECT label, vec_id,
             sum(CAST(CAST(e AS DOUBLE) AS DECIMAL(12,9)) * CAST(CAST(e AS DOUBLE) AS DECIMAL(12,9))) AS n2
           FROM (SELECT label, vec_id, unnest(embedding) AS e FROM embeddings)
           GROUP BY label, vec_id)
         SELECT label, count(1) AS n,
           CAST(CAST(sum(n2) AS VARCHAR) AS DOUBLE) AS energy,
           min(sqrt(CAST(CAST(n2 AS VARCHAR) AS DOUBLE))) AS min_norm,
           max(sqrt(CAST(CAST(n2 AS VARCHAR) AS DOUBLE))) AS max_norm
         FROM n GROUP BY label ORDER BY label"""
  )
}
