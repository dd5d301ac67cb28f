package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Link-graph centrality — the crawl-prioritization pass of a
  * pretraining data pipeline (PageRank over the domain/link graph,
  * the posture CommonCrawl publishes as its domain ranks; Page et
  * al. 1999).
  *
  * The reference pipeline has no graph surface, so the gate derives a
  * deterministic bipartite interaction graph from the warehouse
  * tables (customer↔supplier via lineitem⋈orders) — the engine
  * operator itself is generic over any (src, dst) edge list.
  *
  * EXACT-INTEGER arithmetic (the q_hll_exact / histogram-quantile
  * posture): rank mass is an UNSCALED BIGINT at scale 10⁻¹⁷ and every
  * update is integral floor-division (Spark `div`, DuckDB `//`) —
  *
  *   pr₀(v)   = P div N                      (P = 10¹⁷)
  *   c(u)     = pr(u) div outdeg(u)          (per-edge contribution)
  *   pr'(v)   = (15·P div 100) div N + (85 · Σ_{u→v} c(u)) div 100
  *
  * so both engines land every round bit-identically: the oracle
  * re-derives ALL K rounds as unrolled CTEs and the gate hash covers
  * exact rank integers, not float approximations. Overflow audit:
  * Σ pr ≤ P = 10¹⁷ (floor division only loses mass), so the hottest
  * node's 85·Σc ≤ 8.5·10¹⁸ < 2⁶³−1 and 15·P = 1.5·10¹⁸ < 2⁶³−1; the
  * DuckDB side sums in HUGEINT and casts each round back to BIGINT.
  *
  * Scale shape (the Pregel iterate expressed declaratively): edges
  * join their out-degree ONCE and persist hash-partitioned on src;
  * each round is one shuffle of per-edge contribution PARTIALS
  * (map-side combine on dst) + the rank-frame side of the join —
  * BROADCAST while the node census fits [[BroadcastNodeLimit]] (no
  * per-round edge sort at all), an exchange (node-count sized,
  * ≪ edges) beyond it — and the rank frame localCheckpoints so
  * lineage stays flat across rounds. The persisted edge side
  * satisfies the fallback join's required distribution, so the edge
  * list never re-shuffles after setup. Nothing collects to the
  * driver; the round count is the only sequential dimension.
  *
  * Dangling nodes: callers must pass a graph where every node has
  * outdeg ≥ 1 (the symmetric construction used here guarantees it);
  * [[pageRank]] `require`s it so dangling mass can't silently leak
  * instead of needing a redistribution term.
  */
object Graph {

  /** P = 10¹⁷ — the unscaled-rank grid. */
  val Scale: Long = 100000000000000000L

  /** Symmetric bipartite interaction edges from the warehouse:
    * customer node = 2·custkey, supplier node = 2·suppkey+1, one edge
    * per DISTINCT (customer, supplier) pair that shares a lineitem,
    * both directions. Every node in the frame has degree ≥ 1 by
    * construction. */
  def interactionEdges(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val pairs = lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2L).as("c"),
        (col("l_suppkey").cast("long") * 2L + 1L).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** Rank frames at or under this row count broadcast into the round
    * join (one map-side pass + partial agg — no per-round edge sort);
    * larger graphs fall back to the shuffled join, whose exchange is
    * satisfied by the persisted edge partitioning. The
    * `Similarity.cosineNearDupPairs` size-guard posture. */
  val BroadcastNodeLimit: Long = 4000000L

  /** The shared iterate: rounds 0..iters of the exact-integer update,
    * with a per-round audit callback over the current rank frame. */
  private def iterate(edges: DataFrame, iters: Int,
                      noDanglingByConstruction: Boolean = false)
                     (audit: (Int, DataFrame) => Unit): DataFrame = {
    require(iters >= 1, s"iters=$iters out of range")
    // the raw edge frame backs every setup derivation (degree census,
    // node count, dangling audit, the degree join) — persist it once
    // so the upstream edge derivation (often a join+distinct) runs a
    // single time
    val e = edges.persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg")).persist()
    val n = deg.count() // deg IS the node census: one row per src
    require(n > 0, "empty graph")
    // dangling = a dst that is nobody's src; anti join against the
    // node-sized census (broadcast under AQE while it fits) instead of
    // an edge×edge exceptAll. Callers whose edge derivation is
    // SYMMETRIC ([[symmetricFromDirected]]: every node appears as src)
    // skip the full-edge audit job — the property holds by
    // construction, not by data (r19 optimization pass).
    if (!noDanglingByConstruction) {
      val dangling = e.select(col("dst"))
        .join(deg, col("dst") === col("src"), "left_anti").limit(1).count()
      require(dangling == 0, "graph has dangling nodes (dst without out-edges)")
    }
    val small = n <= BroadcastNodeLimit
    // node-sized rank frames broadcast into the round join (no edge
    // sort or exchange at all); huge graphs keep the shuffled join,
    // whose edge side is pre-partitioned on src ONCE here so only the
    // rank side exchanges per round
    val ewdBase = e.join(deg, "src")
    val ewd = (if (small) ewdBase else ewdBase.repartition(col("src"))).persist()
    val prSide: DataFrame => DataFrame = if (small) broadcast else identity
    val base = (15L * Scale / 100L) / n
    var pr = deg.select(col("src").as("node"))
      .withColumn("pr", lit(Scale / n))
      .checkpointLinted()
    ewd.count() // materialize off the cached e before dropping it
    deg.unpersist()
    e.unpersist()
    audit(0, pr)
    var r = 1
    while (r <= iters) {
      pr = ewd.join(prSide(pr), ewd("src") === pr("node"))
        .select(col("dst"), expr("pr div odeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("csum"))
        .select(col("dst").as("node"),
          expr(s"${base}L + (85L * csum) div 100L").as("pr"))
        .checkpointLinted()
      audit(r, pr)
      r += 1
    }
    ewd.unpersist()
    pr
  }

  /** K rounds of exact-integer PageRank over an edge list with no
    * dangling nodes. Returns the full final frame (node, pr) — pr is
    * the unscaled BIGINT rank at 10⁻¹⁷. */
  def pageRank(edges: DataFrame, iters: Int,
               noDanglingByConstruction: Boolean = false): DataFrame =
    iterate(edges, iters, noDanglingByConstruction)((_, _) => ())

  /** ONE iterate, BOTH reports: the final rank frame (checkpointed —
    * safe to reuse across queries) plus the per-round mass ledger. A
    * production pipeline computes the ranking once per epoch and
    * publishes every report from it; the gate queries share this run
    * through a memo so the 6-round iterate doesn't execute once per
    * report. The ledger costs one node-frame aggregation per round on
    * top of the plain iterate. */
  def pageRankWithMass(edges: DataFrame, iters: Int,
      noDanglingByConstruction: Boolean = false)
      : (DataFrame, Seq[(Int, Long, Long)]) = {
    val rows = Seq.newBuilder[(Int, Long, Long)]
    val pr = iterate(edges, iters, noDanglingByConstruction) { (round, p) =>
      val a = p.agg(count(lit(1)).as("n"), sum(col("pr")).as("s")).head()
      rows += ((round, a.getLong(0), a.getLong(1)))
    }
    (pr, rows.result())
  }

  /** The top-k report over an already-computed rank frame. */
  def pageRankTopFrom(pr: DataFrame, k: Int): DataFrame =
    pr.select(col("node").as("node_id"),
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node div 2").as("entity_key"),
        col("pr").as("pagerank_u"))
      .orderBy(col("pagerank_u").desc, col("node_id").asc)
      .limit(k)

  /** Gate shape: top-k nodes of the interaction graph by exact rank,
    * decoded back to (entity kind, warehouse key). */
  def pageRankTop(lineitem: DataFrame, orders: DataFrame,
                  iters: Int, k: Int): DataFrame =
    pageRankTopFrom(pageRank(interactionEdges(lineitem, orders), iters), k)

  /** Per-round mass ledger: (round, n_nodes, total_pr_u) for rounds
    * 0..iters — floor division only ever loses mass, so total_pr_u is
    * non-increasing from P. Exercises every intermediate frame, so a
    * drifted round is a red row even if the final ranking happens to
    * agree. */
  def pageRankMass(lineitem: DataFrame, orders: DataFrame,
                   iters: Int): DataFrame = {
    val edges = interactionEdges(lineitem, orders)
    val spark = edges.sparkSession
    val rows = Seq.newBuilder[(Int, Long, Long)]
    iterate(edges, iters) { (round, pr) =>
      val a = pr.agg(count(lit(1)).as("n"), sum(col("pr")).as("s")).head()
      rows += ((round, a.getLong(0), a.getLong(1)))
    }
    import spark.implicits._
    rows.result().toDF("round", "n_nodes", "total_pr_u")
      .orderBy(col("round"))
  }

  /** DIRECTED interaction edges — customer → supplier, one row per
    * distinct pair: the bipartite direction [[hits]] needs (hubs =
    * buyers, authorities = suppliers). */
  def directedInteractionEdges(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey").cast("long") * 2L).as("src"),
        (col("l_suppkey").cast("long") * 2L + 1L).as("dst"))
      .distinct()

  /** EXACT-INTEGER HITS (Kleinberg 1999, the other classic link-
    * analysis iterate): hub and authority mass on the same unscaled
    * 10⁻¹⁷ BIGINT grid as [[pageRank]], with L1 normalization per
    * half-step done as `P·raw div Σraw` — the product runs in
    * DECIMAL(38,0) (≤ 10³⁴, exact) and the quotient is ≤ P, so the
    * integral division lands back in BIGINT losslessly; DuckDB replays
    * every round in HUGEINT. Each half-step is one broadcast join of
    * the node-sized score frame into the persisted edge list + a
    * partial-agg (the pageRank round shape); nothing collects to the
    * driver. Returns (hubs(node, h_u), authorities(node, a_u)) after
    * `iters` full rounds. */
  def hits(edges0: DataFrame, iters: Int,
           edgesDistinct: Boolean = false): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters=$iters out of range")
    // `edgesDistinct`: callers whose edge derivation already ends in a
    // DISTINCT (the gate's memoized directed pair list) skip a second
    // full-frame exchange here — a pure plan-shape saving, the row set
    // is identical by the caller's contract (r19 optimization pass)
    val cast = edges0.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val e = (if (edgesDistinct) cast else cast.distinct()).persist()
    // ONE distinct-src census feeds both the node count and h₀ — the
    // prior shape paid two full-edge exchanges for the same rows (r19)
    val srcs = e.select(col("src").as("node")).distinct().checkpointLinted()
    val nSrc = srcs.count()
    require(nSrc > 0, "empty graph")
    def normalize(raw0: DataFrame, out: String): DataFrame = {
      // materialize the raw sums once (they feed the total AND the
      // quotient); sum in DECIMAL: Σ_v raw(v) = Σ_u score(u)·deg(u)
      // can pass 2⁶³ on hub-heavy graphs even though each raw(v) fits
      // a long. The total is ONE row — read it on the driver and embed
      // it as a decimal literal instead of crossJoin(broadcast(agg)),
      // which paid a BroadcastExchange job per half-step (r19; the
      // values are bit-identical: same DECIMAL(38,0) operand, same
      // integral division)
      val raw = raw0.checkpointLinted()
      val s = raw.agg(sum(col("raw").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
      raw.select(col("node"),
        expr(s"CAST(CAST(raw AS DECIMAL(38,0)) * ${Scale}L AS DECIMAL(38,0)) " +
          s"div CAST('$s' AS DECIMAL(38,0))").as(out))
    }
    var h = srcs.withColumn("h", lit(Scale / nSrc))
    var a: DataFrame = null
    var r = 1
    while (r <= iters) {
      a = normalize(
        e.join(broadcast(h), e("src") === h("node"))
          .groupBy(col("dst")).agg(sum(col("h")).as("raw"))
          .select(col("dst").as("node"), col("raw")), "a")
      h = normalize(
        e.join(broadcast(a), e("dst") === a("node"))
          .groupBy(col("src")).agg(sum(col("a")).as("raw"))
          .select(col("src").as("node"), col("raw")), "h")
      r += 1
    }
    e.unpersist()
    (h, a)
  }

  /** Gate shape: the top-k hubs and top-k authorities of the directed
    * interaction graph, decoded to warehouse keys. */
  def hitsTop(lineitem: DataFrame, orders: DataFrame,
              iters: Int, k: Int): DataFrame =
    hitsTopFrom(directedInteractionEdges(lineitem, orders), iters, k)

  /** [[hitsTop]] over ALREADY-DERIVED directed edges — the serve shape
    * when the edge list is shared across graph reports (one derivation
    * per epoch, N reports from it; the bench memoizes exactly this).
    *
    * PRECONDITION: `edges` must be DISTINCT (src, dst) rows. The epoch
    * derivation this entry point serves
    * ([[directedInteractionEdges]]) ends in a DISTINCT by
    * construction; callers bringing their own edge frame must dedup it
    * first or duplicate edges double-count in the HITS sums. */
  def hitsTopFrom(edges: DataFrame, iters: Int, k: Int): DataFrame = {
    // the gate's memoized edge list ends in a DISTINCT by construction
    // ([[directedInteractionEdges]]) — skip re-deduplicating 586k rows
    val (h, a) = hits(edges, iters, edgesDistinct = true)
    def arm(df: DataFrame, scoreCol: String, tpe: String) =
      df.orderBy(col(scoreCol).desc, col("node").asc).limit(k)
        .select(lit(tpe).as("node_type"),
          expr("node div 2").as("entity_key"),
          col(scoreCol).as("score_u"))
    arm(h, "h", "hub").unionByName(arm(a, "a", "authority"))
      .orderBy(col("node_type"), col("score_u").desc, col("entity_key").asc)
  }

  /** Oracle for [[hitsTop]]: K unrolled HUGEINT rounds. */
  def hitsTopOracleSql(iters: Int, k: Int): String = {
    val P = Scale
    val rounds = (1 to iters).map { t =>
      val ph = if (t == 1) "h0" else s"h${t - 1}"
      s"""ra$t AS MATERIALIZED (
            SELECT dst AS node, CAST(sum(v) AS BIGINT) AS raw
            FROM e JOIN $ph ON $ph.node = e.src GROUP BY dst),
          a$t AS MATERIALIZED (
            SELECT node, CAST((CAST(raw AS HUGEINT) * $P) //
              (SELECT sum(CAST(raw AS HUGEINT)) FROM ra$t) AS BIGINT) AS v
            FROM ra$t),
          rh$t AS MATERIALIZED (
            SELECT src AS node, CAST(sum(v) AS BIGINT) AS raw
            FROM e JOIN a$t ON a$t.node = e.dst GROUP BY src),
          h$t AS MATERIALIZED (
            SELECT node, CAST((CAST(raw AS HUGEINT) * $P) //
              (SELECT sum(CAST(raw AS HUGEINT)) FROM rh$t) AS BIGINT) AS v
            FROM rh$t)"""
    }.mkString(",\n          ")
    s"""WITH pairs AS MATERIALIZED (
            SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS c,
                            CAST(l_suppkey AS BIGINT) * 2 + 1 AS s
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          e AS MATERIALIZED (SELECT c AS src, s AS dst FROM pairs),
          h0 AS MATERIALIZED (
            SELECT node, CAST($P // (SELECT count(1) FROM
              (SELECT DISTINCT src FROM e)) AS BIGINT) AS v
            FROM (SELECT DISTINCT src AS node FROM e)),
          $rounds,
          tops AS (
            SELECT 'hub' AS node_type, CAST(node // 2 AS BIGINT) AS entity_key,
              v AS score_u,
              row_number() OVER (ORDER BY v DESC, node ASC) AS rn
            FROM h$iters
            UNION ALL
            SELECT 'authority', CAST(node // 2 AS BIGINT), v,
              row_number() OVER (ORDER BY v DESC, node ASC) AS rn
            FROM a$iters)
          SELECT node_type, entity_key, score_u FROM tops
          WHERE rn <= $k
          ORDER BY node_type, score_u DESC, entity_key ASC"""
  }

  /** Degree profile of the interaction graph: (odeg, n_nodes) — the
    * skew census a crawl scheduler reads before sharding. */
  def degreeProfile(lineitem: DataFrame, orders: DataFrame): DataFrame =
    degreeProfileFrom(interactionEdges(lineitem, orders))

  /** [[degreeProfile]] over already-derived symmetric edges. */
  def degreeProfileFrom(edges: DataFrame): DataFrame =
    edges
      .groupBy(col("src")).agg(count(lit(1)).as("odeg"))
      .groupBy(col("odeg")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("odeg"))

  /** Symmetric (both-direction) edges from the directed pair list —
    * [[interactionEdges]] is exactly this union over
    * [[directedInteractionEdges]]; split out so ONE join+distinct
    * derivation can feed both edge shapes. */
  def symmetricFromDirected(directed: DataFrame): DataFrame =
    directed.select(col("src"), col("dst"))
      .unionAll(directed.select(col("dst").as("src"), col("src").as("dst")))

  // ---------------------------------------------------------------
  // Generated DuckDB oracles — K unrolled integer rounds.
  // ---------------------------------------------------------------

  /** Shared WITH-prefix: edge derivation, degree census, constants,
    * p0..p$iters. Every round's sum runs in DuckDB's HUGEINT and is
    * cast back to BIGINT, mirroring the engine's in-range longs. */
  private def oraclePrefix(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      val prev = t - 1
      s"""p$t AS MATERIALIZED (
           SELECT e.dst AS node,
             CAST(b.b + (85 * sum(p.pr // d.odeg)) // 100 AS BIGINT) AS pr
           FROM p$prev p
           JOIN e ON e.src = p.node
           JOIN deg d ON d.src = p.node
           CROSS JOIN base b
           GROUP BY e.dst, b.b)"""
    }.mkString(",\n         ")
    s"""WITH pairs AS MATERIALIZED (
           SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS c,
                           CAST(l_suppkey AS BIGINT) * 2 + 1 AS s
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS MATERIALIZED (
           SELECT c AS src, s AS dst FROM pairs
           UNION ALL
           SELECT s AS src, c AS dst FROM pairs),
         deg AS MATERIALIZED (
           SELECT src, count(1) AS odeg FROM e GROUP BY src),
         nn AS (SELECT count(1) AS n FROM deg),
         base AS (
           SELECT CAST((15 * ${Scale} // 100) // n AS BIGINT) AS b,
                  CAST(${Scale} // n AS BIGINT) AS p0v
           FROM nn),
         p0 AS MATERIALIZED (
           SELECT d.src AS node, b.p0v AS pr FROM deg d CROSS JOIN base b),
         $rounds"""
  }

  /** Oracle for [[pageRankTop]]. */
  def pageRankTopOracleSql(iters: Int, k: Int): String =
    oraclePrefix(iters) +
      s"""
       SELECT node AS node_id,
         CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         CAST(node // 2 AS BIGINT) AS entity_key,
         pr AS pagerank_u
       FROM p$iters
       ORDER BY pagerank_u DESC, node_id ASC
       LIMIT $k"""

  /** Oracle for [[pageRankMass]]. */
  def pageRankMassOracleSql(iters: Int): String = {
    val arms = (0 to iters).map { t =>
      s"""SELECT $t AS round, CAST(count(1) AS BIGINT) AS n_nodes,
            CAST(sum(pr) AS BIGINT) AS total_pr_u FROM p$t"""
    }.mkString("\n       UNION ALL ")
    oraclePrefix(iters) +
      s"""
       $arms
       ORDER BY round"""
  }

  /** Oracle for [[degreeProfile]]. */
  def degreeProfileOracleSql: String =
    """WITH pairs AS MATERIALIZED (
         SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS c,
                         CAST(l_suppkey AS BIGINT) * 2 + 1 AS s
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       e AS (
         SELECT c AS src, s AS dst FROM pairs
         UNION ALL
         SELECT s AS src, c AS dst FROM pairs),
       deg AS (SELECT src, count(1) AS odeg FROM e GROUP BY src)
       SELECT odeg, CAST(count(1) AS BIGINT) AS n_nodes
       FROM deg GROUP BY odeg ORDER BY odeg"""
}
