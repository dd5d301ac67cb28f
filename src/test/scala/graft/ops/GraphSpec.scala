package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft.ops.Graph — exact-integer PageRank. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val P = Graph.Scale

  /** Hand replay of one integer round over an adjacency map. */
  private def handRound(pr: Map[Long, Long], edges: Seq[(Long, Long)],
                        n: Long): Map[Long, Long] = {
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (15L * P / 100L) / n
    edges.groupBy(_._2).map { case (dst, es) =>
      val csum = es.map { case (s, _) => pr(s) / odeg(s) }.sum
      dst -> (base + (85L * csum) / 100L)
    }
  }

  private def edgesDf(es: Seq[(Long, Long)]) =
    es.toDF("src", "dst")

  behavior of "Graph.pageRank"

  it should "match a hand-computed integer iterate on a toy graph" in {
    // 4-node symmetric path 1-2-3-4 (every node has out-edges)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val es = und ++ und.map { case (a, b) => (b, a) }
    val n = 4L
    var hand = Seq(1L, 2L, 3L, 4L).map(_ -> P / n).toMap
    hand = handRound(hand, es, n)
    hand = handRound(hand, es, n)
    val got = Graph.pageRank(edgesDf(es), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe hand
    // middle nodes (degree 2) outrank the endpoints
    got(2L) should be > got(1L)
    got(3L) should be > got(4L)
  }

  it should "be invariant under repartitioning" in {
    val und = (1L to 40L).map(i => (i, (i % 7) + 100L))
    val es = und ++ und.map { case (a, b) => (b, a) }
    val a = Graph.pageRank(edgesDf(es), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Graph.pageRank(edgesDf(es).repartition(13), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    a shouldBe b
  }

  it should "conserve mass up to floor losses" in {
    val und = (1L to 30L).flatMap(i => Seq((i, i % 5 + 200L), (i, i % 3 + 300L)))
    val es = (und ++ und.map { case (a, b) => (b, a) }).distinct
    val nodes = es.map(_._1).distinct
    val n = nodes.size.toLong
    val pr = Graph.pageRank(edgesDf(es), iters = 4)
      .agg(sum(col("pr"))).head().getLong(0)
    pr should be <= P
    // each node loses < 1 unit per div, 3 divs per round, 4 rounds,
    // plus the initial P div N remainder — a very loose floor
    pr should be > P - (n * es.size * 5L + n)
  }

  it should "reject graphs with dangling nodes" in {
    an[IllegalArgumentException] should be thrownBy
      Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), iters = 1)
  }

  it should "rank the hub of a star highest" in {
    val und = (1L to 9L).map(i => (0L, i))
    val es = und ++ und.map { case (a, b) => (b, a) }
    val top = Graph.pageRank(edgesDf(es), iters = 4)
      .orderBy(col("pr").desc).limit(1).head()
    top.getLong(0) shouldBe 0L
  }

  behavior of "Graph.interactionEdges"

  it should "emit a symmetric bipartite edge list with no dangling nodes" in {
    val li = Seq((100L, 7L), (100L, 8L), (101L, 7L))
      .toDF("l_orderkey", "l_suppkey")
    val ord = Seq((100L, 1L), (101L, 2L)).toDF("o_orderkey", "o_custkey")
    val es = Graph.interactionEdges(li, ord)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // customer nodes even, supplier nodes odd
    es shouldBe Set(
      (2L, 15L), (15L, 2L), (2L, 17L), (17L, 2L), (4L, 15L), (15L, 4L))
  }

  behavior of "Graph.hits"

  it should "rank the broad hub and the shared authority highest" in {
    // hub 2 links to both suppliers; hub 4 to one; supplier 11 is
    // cited by both hubs, supplier 13 by one
    val es = Seq((2L, 11L), (2L, 13L), (4L, 11L))
    val (h, a) = Graph.hits(edgesDf(es), iters = 4)
    val hubs = h.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val auths = a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    hubs(2L) should be > hubs(4L)
    auths(11L) should be > auths(13L)
    // L1 normalization keeps each side's mass within floor losses of P
    (hubs.values.sum.toDouble / P) shouldBe 1.0 +- 1e-9
    (auths.values.sum.toDouble / P) shouldBe 1.0 +- 1e-9
  }

  it should "be bit-identical under repartitioning" in {
    val es = Seq((2L, 11L), (2L, 13L), (4L, 11L), (6L, 13L), (6L, 15L))
    val (h1, a1) = Graph.hits(edgesDf(es), iters = 3)
    val (h2, a2) = Graph.hits(edgesDf(es).repartition(7), iters = 3)
    h1.orderBy("node").collect().map(_.toSeq).toSeq shouldBe
      h2.orderBy("node").collect().map(_.toSeq).toSeq
    a1.orderBy("node").collect().map(_.toSeq).toSeq shouldBe
      a2.orderBy("node").collect().map(_.toSeq).toSeq
  }
}
