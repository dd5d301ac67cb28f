package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the cheap
  * dimensionality-reduction pass an embedding pipeline runs before
  * clustering / dedup / ANN when d is large (Achlioptas 2003:
  * database-friendly ±1 projections preserve pairwise distances in
  * expectation with r = O(log n / ε²) output dims).
  *
  * ENGINE-REPRODUCIBLE by construction: the projection matrix is not
  * random state but a PURE HASH — sign(i, j) = +1 iff the first hex
  * digit of md5("rp:i:j") < '8' — so both engines derive the same
  * matrix independently and no seed/matrix artifact needs shipping
  * (the md5-draw posture of `q_sample_reservoir` / `q_bloom_exact`).
  * Arithmetic follows the [[Pca]] grid: inputs quantize to
  * DECIMAL(12,9) (float → double → decimal, the q_embed_dimstats
  * idiom), a ±1 multiply stays on the grid exactly, and the 64-term
  * sum accumulates in DECIMAL(21,9) — scale never drops below 9, so
  * every output value is bit-identical in Spark and DuckDB. The
  * unscaled sums are emitted; consumers apply the constant 1/√r
  * (irrational, so it stays out of the exact layer).
  *
  * Scale shape (the [[Pca.projectTopR]] posture): ONE corpus scan, r
  * scan-fused exact-decimal folds in a single Project — no explode,
  * no join, no shuffle before the output sort. The d×r sign matrix is
  * plan literals (1 KiB-scale), never a broadcast or a table.
  */
object RandomProjection {

  /** Input embedding width (the corpus's embedding column). */
  val Dims: Int = Pca.Dims

  /** Default output width: 16 dims keeps ε ≈ 1/√r ≈ 25 % — the
    * coarse-bucketing regime (LSH prefilters, cluster seeding). */
  val OutDims: Int = 16

  /** The pure-hash ±1 draw, identical in both engines:
    * first hex digit of md5("rp:i:j") < '8'. */
  def sign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** One output dim's scan-fused exact fold: Σᵢ dec(xᵢ)·s(i,j) with
    * the signs inlined as a literal array. */
  private def projExpr(embCol: String, j: Int): String = {
    val signs = (0 until Dims).map(i => sign(i, j)).mkString("array(", ", ", ")")
    s"""CAST(CAST(aggregate(sequence(0, ${Dims - 1}),
          CAST(0 AS DECIMAL(21,9)),
          (acc, i) -> CAST(acc + CAST(
            CAST(CAST($embCol[i] AS DOUBLE) AS DECIMAL(12,9)) *
            element_at($signs, i + 1) AS DECIMAL(14,9)) AS DECIMAL(21,9)))
        AS STRING) AS DOUBLE)"""
  }

  /** Project the corpus to r dims: (idCol, p1..p{r}), one scan. */
  def project(emb: DataFrame, embCol: String, idCol: String,
              r: Int = OutDims): DataFrame = {
    require(r >= 1 && r <= 64, s"r=$r out of range")
    emb.select(col(idCol) +: (0 until r).map { j =>
      expr(projExpr(embCol, j)).as(s"p${j + 1}")
    }: _*)
  }

  /** The DuckDB replay: same grid quantization ([[Pca]]'s VARCHAR-hop
    * float→DECIMAL(12,9)), same md5 sign draw, same exact sums —
    * pivoted wide to match [[project]]'s column layout. */
  def oracleSql(table: String, embCol: String, idCol: String,
                r: Int = OutDims): String = {
    val arms = (0 until r).map { j =>
      s"""MAX(CASE WHEN j = $j
            THEN CAST(CAST(y AS VARCHAR) AS DOUBLE) END) AS p${j + 1}"""
    }.mkString(",\n         ")
    s"""WITH idx AS (SELECT unnest(range(1, ${Dims + 1})) AS i),
         outs AS (SELECT unnest(range(0, $r)) AS j),
         signs AS (
           SELECT i.i, o.j,
             CASE WHEN substr(md5('rp:' || (i.i - 1) || ':' || o.j), 1, 1) < '8'
                  THEN 1 ELSE -1 END AS s
           FROM idx i CROSS JOIN outs o),
         x AS MATERIALIZED (SELECT $idCol, $embCol AS e FROM $table),
         xsid AS MATERIALIZED (
           SELECT $idCol, i.i,
             CAST(CAST(CAST(e[i.i] AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) AS xd
           FROM x CROSS JOIN idx i),
         proj AS (
           SELECT xi.$idCol, s.j, sum(xi.xd * s.s) AS y
           FROM xsid xi JOIN signs s ON s.i = xi.i
           GROUP BY xi.$idCol, s.j)
       SELECT $idCol,
         $arms
       FROM proj GROUP BY $idCol ORDER BY $idCol"""
  }
}
