package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tools.Ckpt._

/** Greedy k-center coreset selection (Gonzalez 1985) over an
  * embedding column — the diversity-driven data-selection pass a
  * pretraining pipeline runs to pick maximally-spread exemplars
  * (facility-location/coreset literature; 2-approximation of the
  * optimal k-center radius).
  *
  * Algorithm: seed with the minimum id; k−1 rounds of "select the
  * point farthest from the selected set", maintaining a running
  * per-point min-squared-distance column. Every distance is EXACT
  * DECIMAL on the (12,9) grid (the [[Similarity]] posture: float →
  * double → decimal hop, products at (25,18), accumulator re-cast to
  * (28,18) per add), and ties break on vec_id — so the selection is
  * bit-reproducible across partitionings AND engines, and the DuckDB
  * oracle re-derives every center independently from k unrolled CTE
  * rounds.
  *
  * Scale shape: each round is ONE corpus scan (zip_with fold against
  * the broadcast-as-literals center vector — d decimal ops per row,
  * no shuffle) plus a TakeOrdered(1) argmax (per-partition max →
  * k-sized driver merge, never a full sort). The working frame is
  * (id, vec, mind) — localCheckpoint'ed per round so lineage stays
  * flat; total cost k scans, the textbook greedy construction. At
  * 100 TB with large k, amortize by batching (select several spread
  * centers per scan) — documented, not needed at gate scale.
  */
object Coreset {

  private val D = "decimal(12,9)"
  private val ACC = "decimal(28,18)"

  private def d(x: Column): Column = x.cast("double").cast(D)

  /** Exact-decimal squared distance of a float-array column to a
    * gridded center vector riding the plan as decimal literals. */
  private def dist2(vec: Column, center: Seq[String]): Column =
    aggregate(
      zip_with(vec, array(center.map(s => lit(s).cast(D)): _*),
        (x, y) => (d(x) - y) * (d(x) - y)),
      lit(0).cast(ACC),
      (acc, x) => (acc + x).cast(ACC))

  /** The gridded (string-form) vector of one id — computed IN the
    * engine so both sides share the exact double→decimal rounding. */
  private def griddedVec(emb: DataFrame, idCol: String, vecCol: String,
                         id: Long): Seq[String] =
    emb.filter(col(idCol) === id)
      .select(transform(col(vecCol), x => d(x).cast("string")).as("gv"))
      .head().getSeq[String](0)

  /** One selected center: rank, id, radius (distance² to the prior
    * set; 0 for the seed), and the gridded vector. */
  final case class Center(rank: Int, id: Long, radius: Double,
                          gvec: Seq[String])

  /** The greedy selection loop shared by [[kCenter]] and
    * [[kCenterAssign]]. */
  def selectCenters(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): Seq[Center] = {
    require(k >= 1, s"k=$k out of range")
    val seedId = emb.agg(min(col(idCol))).head().getLong(0)
    val selected = Seq.newBuilder[Center]
    var center = griddedVec(emb, idCol, vecCol, seedId)
    selected += Center(1, seedId, 0.0, center)
    var work = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("mind", dist2(col("v"), center))
      .checkpointLinted()
    var r = 2
    while (r <= k) {
      val top = work
        .select(col("id"), col("mind"),
          transform(col("v"), x => d(x).cast("string")).as("gv"))
        .orderBy(col("mind").desc, col("id").asc)
        .limit(1).head()
      center = top.getSeq[String](2)
      // decimal → double via the string hop (both engines parse
      // decimal digit strings with correct rounding)
      selected += Center(r, top.getLong(0),
        java.lang.Double.parseDouble(top.getDecimal(1).toPlainString), center)
      if (r < k)
        work = work
          .withColumn("mind", least(col("mind"), dist2(col("v"), center)))
          .checkpointLinted()
      r += 1
    }
    selected.result()
  }

  /** Greedy k-center selection: (sel_rank, vec_id, radius) — radius
    * is the selected point's distance² to the prior set (the running
    * coverage bound; 0 for the seed). */
  def kCenter(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    kCenterFrom(emb.sparkSession, selectCenters(emb, idCol, vecCol, k))

  /** [[kCenter]]'s report frame over ALREADY-SELECTED centers — split
    * out so one greedy run can feed both the selection report and the
    * assignment audit (the centers are the expensive part: k corpus
    * scans; the query layer memoizes them per (application, sfDir)). */
  def kCenterFrom(spark: SparkSession, centers: Seq[Center]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        centers.map(c => Row(c.rank, c.id, c.radius)), 1),
      StructType(Seq(
        StructField("sel_rank", IntegerType, false),
        StructField("vec_id", LongType, false),
        StructField("radius", DoubleType, false))))
      .orderBy(col("sel_rank"))

  /** Coverage audit: assign every point to its nearest selected
    * center (exact-decimal argmin, rank tie-break) and report per
    * center (sel_rank, vec_id, n_assigned, max_d2) — cluster sizes
    * and the realized per-cluster radius. ONE scan: all k distances
    * fold in a single projection (k·d decimal ops per row), the
    * argmin is a `least` over (dist, rank) structs, and only (rank,
    * partial count, partial max) partials shuffle. */
  def kCenterAssign(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame =
    kCenterAssignFrom(emb, idCol, vecCol,
      selectCenters(emb, idCol, vecCol, k))

  /** [[kCenterAssign]] over already-selected centers (see
    * [[kCenterFrom]]). */
  def kCenterAssignFrom(emb: DataFrame, idCol: String, vecCol: String,
                        centers: Seq[Center]): DataFrame = {
    val best = least(centers.map(c =>
      struct(dist2(col("v"), c.gvec).as("d2"), lit(c.rank).as("rnk"))): _*)
    val byRank = emb.sparkSession.createDataFrame(
      emb.sparkSession.sparkContext.parallelize(
        centers.map(c => Row(c.rank, c.id)), 1),
      StructType(Seq(
        StructField("sel_rank", IntegerType, false),
        StructField("vec_id", LongType, false))))
    emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .select(best.as("b"))
      .groupBy(col("b.rnk").as("sel_rank"))
      .agg(count(lit(1)).as("n_assigned"),
        max(col("b.d2")).as("maxd"))
      .join(broadcast(byRank), "sel_rank")
      .select(col("sel_rank"), col("vec_id"), col("n_assigned"),
        // decimal → double via the string hop
        col("maxd").cast("string").cast("double").as("max_d2"))
      .orderBy(col("sel_rank"))
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998,
    * SIGIR — the classic relevance-vs-redundancy re-ranker): given a
    * probe (here the embedding of the minimum id — the same
    * deterministic-seed convention as [[selectCenters]]), pick k
    * vectors greedily where round 1 takes the MOST RELEVANT candidate
    * (min distance² to the probe) and each later round maximizes
    * `diversity − relevance-cost` = (min dist² to the selected set)
    * − (dist² to the probe) — the distance form of MMR at λ = 1/2
    * (the score is the λ-combination scaled by 2, which preserves the
    * argmax). Every distance is EXACT DECIMAL on the (12,9) grid and
    * ties break on the id, so the selection is bit-reproducible across
    * partitionings and engines; the DuckDB oracle re-derives all k
    * rounds independently.
    *
    * Output: (sel_rank, vec_id, rel_d2, gain_d2) — the pick's
    * distance² to the probe and its min-distance² to the prior
    * selection (0 for the seed).
    *
    * Scale shape = [[selectCenters]]: one scan to pin the probe
    * distances, then per round one fused-projection scan (d decimal
    * ops/row against the new pick's literal vector) + a
    * TakeOrdered(1) argmax; the selected-id exclusion is a k-sized
    * NOT-IN literal. No corpus shuffle anywhere. */
  def mmrSelect(emb: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k=$k out of range")
    val spark = emb.sparkSession
    val probeId = emb.agg(min(col(idCol))).head().getLong(0)
    val probe = griddedVec(emb, idCol, vecCol, probeId)
    var work = emb
      .filter(col(idCol) =!= probeId)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("d2q", dist2(col("v"), probe))
      .checkpointLinted()
    def hop(d: java.math.BigDecimal): Double =
      java.lang.Double.parseDouble(d.toPlainString)
    // round 1: most relevant
    val seed = work
      .select(col("id"), col("d2q"),
        transform(col("v"), x => d(x).cast("string")).as("gv"))
      .orderBy(col("d2q").asc, col("id").asc).limit(1).head()
    var picked = Seq(seed.getLong(0))
    var center = seed.getSeq[String](2)
    val rows = Seq.newBuilder[Row]
    rows += Row(1, seed.getLong(0), hop(seed.getDecimal(1)), 0.0)
    var r = 2
    while (r <= k) {
      work = work
        .withColumn("mind",
          if (r == 2) dist2(col("v"), center)
          else least(col("mind"), dist2(col("v"), center)))
        .checkpointLinted()
      val top = work
        .filter(!col("id").isin(picked.map(Long.box): _*))
        .select(col("id"), col("d2q"), col("mind"),
          transform(col("v"), x => d(x).cast("string")).as("gv"))
        .orderBy((col("mind") - col("d2q")).desc, col("id").asc)
        .limit(1).head()
      center = top.getSeq[String](3)
      picked = picked :+ top.getLong(0)
      rows += Row(r, top.getLong(0), hop(top.getDecimal(1)), hop(top.getDecimal(2)))
      r += 1
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.result(), 1),
      StructType(Seq(
        StructField("sel_rank", IntegerType, false),
        StructField("vec_id", LongType, false),
        StructField("rel_d2", DoubleType, false),
        StructField("gain_d2", DoubleType, false))))
      .orderBy(col("sel_rank"))
  }

  // ---------------------------------------------------------------
  // Generated DuckDB oracle — k unrolled rounds re-derive every
  // center: argmax of the running min-distance, exact decimal.
  // ---------------------------------------------------------------

  /** Shared WITH-prefix: grid, seed, and the k−1 unrolled selection
    * rounds (c$r = center, cg$r = its gridded vector, m$r = running
    * min distance). */
  private def oraclePrefix(table: String, k: Int, dims: Int): String = {
    val rounds = (2 to k).map { r =>
      val prev = r - 1
      s"""c$r AS MATERIALIZED (
           SELECT vec_id AS cid, mind FROM m$prev
           ORDER BY mind DESC, vec_id ASC LIMIT 1),
         cg$r AS MATERIALIZED (
           SELECT g.i, g.x FROM g JOIN c$r ON g.vec_id = c$r.cid),
         m$r AS MATERIALIZED (
           SELECT t.vec_id,
             CASE WHEN m.mind < t.d2 THEN m.mind ELSE t.d2 END AS mind
           FROM (SELECT g.vec_id, sum((g.x - cg.x) * (g.x - cg.x)) AS d2
                 FROM g JOIN cg$r cg ON cg.i = g.i GROUP BY g.vec_id) t
           JOIN m$prev m ON m.vec_id = t.vec_id)"""
    }.mkString(",\n         ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM $table),
         idx AS (SELECT unnest(range(1, ${dims + 1})) AS i),
         g AS MATERIALIZED (
           SELECT vec_id, i,
             CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR)
               AS DECIMAL(12,9)) AS x
           FROM e, idx),
         c1 AS MATERIALIZED (SELECT min(vec_id) AS cid FROM e),
         cg1 AS MATERIALIZED (
           SELECT g.i, g.x FROM g JOIN c1 ON g.vec_id = c1.cid),
         m1 AS MATERIALIZED (
           SELECT g.vec_id, sum((g.x - cg.x) * (g.x - cg.x)) AS mind
           FROM g JOIN cg1 cg ON cg.i = g.i GROUP BY g.vec_id),
         $rounds"""
  }

  /** Oracle: same seed, same grid, same argmax tie order. `dims` must
    * match the embedding width. */
  def kCenterOracleSql(table: String, k: Int, dims: Int): String = {
    val sel = (2 to k).map { r =>
      s"""SELECT $r AS sel_rank, cid AS vec_id,
            CAST(CAST(mind AS VARCHAR) AS DOUBLE) AS radius FROM c$r"""
    }.mkString("\n       UNION ALL ")
    oraclePrefix(table, k, dims) +
      s"""
       SELECT 1 AS sel_rank, cid AS vec_id, CAST(0.0 AS DOUBLE) AS radius
       FROM c1
       UNION ALL $sel
       ORDER BY sel_rank"""
  }

  /** Assignment oracle: per-point distance to every derived center,
    * argmin with rank tie-break, per-center count + realized radius. */
  def kCenterAssignOracleSql(table: String, k: Int, dims: Int): String = {
    val dists = (1 to k).map { r =>
      s"""SELECT g.vec_id, $r AS rnk,
            sum((g.x - cg.x) * (g.x - cg.x)) AS d2
          FROM g JOIN cg$r cg ON cg.i = g.i GROUP BY g.vec_id"""
    }.mkString("\n           UNION ALL ")
    val cids = (1 to k).map(r => s"SELECT $r AS rnk, cid FROM c$r")
      .mkString("\n           UNION ALL ")
    oraclePrefix(table, k, dims) +
      s""",
         ad AS MATERIALIZED (
           $dists),
         am AS MATERIALIZED (
           SELECT vec_id, rnk, d2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2 ASC, rnk ASC) AS rn
           FROM ad),
         cids AS MATERIALIZED (
           $cids)
       SELECT a.rnk AS sel_rank, c.cid AS vec_id,
         CAST(count(1) AS BIGINT) AS n_assigned,
         CAST(CAST(max(a.d2) AS VARCHAR) AS DOUBLE) AS max_d2
       FROM am a JOIN cids c ON c.rnk = a.rnk
       WHERE a.rn = 1
       GROUP BY a.rnk, c.cid
       ORDER BY sel_rank"""
  }

  /** Oracle for [[mmrSelect]]: probe = min-id vector, k unrolled
    * greedy rounds (round 1 = min d2q; round r = max (mind − d2q)
    * excluding prior picks), every distance re-derived on the same
    * decimal grid. */
  def mmrOracleSql(table: String, k: Int, dims: Int): String = {
    val rounds = (2 to k).map { r =>
      val prev = r - 1
      val exclude = (1 to prev).map(i => s"SELECT cid FROM c$i")
        .mkString(" UNION ALL ")
      val mindSrc = if (prev == 1) "m1" else s"m$prev"
      s"""c$r AS MATERIALIZED (
           SELECT m.vec_id AS cid, q.d2q, m.mind
           FROM $mindSrc m JOIN q USING (vec_id)
           WHERE m.vec_id NOT IN ($exclude)
           ORDER BY (m.mind - q.d2q) DESC, m.vec_id ASC LIMIT 1),
         cg$r AS MATERIALIZED (
           SELECT g.i, g.x FROM g JOIN c$r ON g.vec_id = c$r.cid),
         m$r AS MATERIALIZED (
           SELECT m.vec_id,
             CASE WHEN m.mind < t.d2 THEN m.mind ELSE t.d2 END AS mind
           FROM (SELECT g.vec_id, sum((g.x - cg.x) * (g.x - cg.x)) AS d2
                 FROM g JOIN cg$r cg ON cg.i = g.i GROUP BY g.vec_id) t
           JOIN $mindSrc m ON m.vec_id = t.vec_id)"""
    }.mkString(",\n         ")
    val sel = (2 to k).map { r =>
      s"""SELECT $r AS sel_rank, cid AS vec_id,
            CAST(CAST(d2q AS VARCHAR) AS DOUBLE) AS rel_d2,
            CAST(CAST(mind AS VARCHAR) AS DOUBLE) AS gain_d2 FROM c$r"""
    }.mkString("\n       UNION ALL ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM $table),
         idx AS (SELECT unnest(range(1, ${dims + 1})) AS i),
         g AS MATERIALIZED (
           SELECT vec_id, i,
             CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR)
               AS DECIMAL(12,9)) AS x
           FROM e, idx),
         p AS MATERIALIZED (SELECT min(vec_id) AS pid FROM e),
         pg AS MATERIALIZED (
           SELECT g.i, g.x FROM g JOIN p ON g.vec_id = p.pid),
         q AS MATERIALIZED (
           SELECT g.vec_id, sum((g.x - pg.x) * (g.x - pg.x)) AS d2q
           FROM g JOIN pg ON pg.i = g.i
           WHERE g.vec_id <> (SELECT pid FROM p)
           GROUP BY g.vec_id),
         c1 AS MATERIALIZED (
           SELECT vec_id AS cid, d2q FROM q
           ORDER BY d2q ASC, vec_id ASC LIMIT 1),
         cg1 AS MATERIALIZED (
           SELECT g.i, g.x FROM g JOIN c1 ON g.vec_id = c1.cid),
         m1 AS MATERIALIZED (
           SELECT q.vec_id, t.d2 AS mind
           FROM q JOIN (
             SELECT g.vec_id, sum((g.x - cg.x) * (g.x - cg.x)) AS d2
             FROM g JOIN cg1 cg ON cg.i = g.i GROUP BY g.vec_id) t
           USING (vec_id)),
         $rounds
       SELECT 1 AS sel_rank, cid AS vec_id,
         CAST(CAST(d2q AS VARCHAR) AS DOUBLE) AS rel_d2,
         CAST(0.0 AS DOUBLE) AS gain_d2 FROM c1
       UNION ALL $sel
       ORDER BY sel_rank"""
  }
}
