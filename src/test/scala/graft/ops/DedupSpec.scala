package graft.ops

import graft.SparkSpec
import graft.tools.Ckpt._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "completely different words appear in this document here"),
      (4L, "the quick brown fox jumps over the lazy dog tonight") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  "exactGroups" should "group identical texts" in {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    g.length shouldBe 3
    val dup = g.find(_.getLong(2) == 2).get
    dup.getLong(1) shouldBe 1L // keep_id = min doc_id
  }

  "minhashNearDups" should "find the planted near-dup pair and the exact dup" in {
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain(1L, 4L) // jaccard 1.0
    pairs should contain(1L, 2L) // one word differs → high jaccard
    pairs should not contain ((1L, 3L))
  }

  "ngramJaccardPairs" should "agree with minhash on this corpus" in {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, "text", "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact shouldBe lsh
  }

  "simhash" should "place near-dups closer than unrelated docs" in {
    val sh = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sh(1L) shouldBe sh(4L) // identical text → identical signature
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    near should be < far
  }

  it should "match the round-1 aggregate formulation bit-for-bit" in {
    // the native expression vs the explode + 64-conditional-sum plan it
    // replaced, on the real gate corpus (500 docs)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = Dedup.simhash(real, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashAgg(real, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    native shouldBe agg
  }

  "minhashNearDupsIncremental" should "equal the full pair set restricted to batch-side pairs" in {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = 250L
    val full = Dedup.minhashNearDups(real, "text", "doc_id", 0.8)
      .filter(col("doc_a") >= split || col("doc_b") >= split)
      .collect().map(_.toSeq).toSet
    val inc = Dedup.minhashNearDupsIncremental(
        real.filter(col("doc_id") < split), real.filter(col("doc_id") >= split),
        "text", "doc_id", 0.8)
      .collect().map(_.toSeq).toSet
    inc shouldBe full
    inc should not be empty
  }

  "minhashSignatures" should "be bit-equal to the declarative aggregate twin" in {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shingled = Dedup.docShingles(real, "text", "doc_id")
    val native = Dedup.minhashSignatures(shingled)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val agg = Dedup.minhashSignaturesAgg(shingled)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    native.keySet shouldBe agg.keySet
    native should not be empty
    native.foreach { case (id, sig) => sig shouldBe agg(id) }
  }

  "minhashNearDupsIndexed" should "match the inline incremental path without touching corpus text" in {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = 250L
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-index").toString
    Dedup.writeDedupIndex(real.filter(col("doc_id") < split), "text", "doc_id", tmp)
    // batch as an in-memory frame: the only file source the indexed
    // plan can possibly reference is the persisted index
    val batch = real.filter(col("doc_id") >= split)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.toDF("doc_id", "text")
    val indexed = Dedup.minhashNearDupsIndexed(tmp, batch, "text", "doc_id", 0.8)
      .collect().map(_.toSeq).toSet
    val inline = Dedup.minhashNearDupsIncremental(
        real.filter(col("doc_id") < split), real.filter(col("doc_id") >= split),
        "text", "doc_id", 0.8)
      .collect().map(_.toSeq).toSet
    indexed shouldBe inline
    indexed should not be empty

    // plan shape: the corpus is consulted ONLY through the stored
    // artifacts — the index path is scanned, the corpus docs parquet
    // never appears, so the corpus side cannot have been re-shingled
    val corpusIndex = spark.read.parquet(s"$tmp/bands").drop("batch")
    val corpusShingles = spark.read.parquet(s"$tmp/shingles").drop("batch")
    val newShingled = Dedup.docShingles(batch, "text", "doc_id")
    val newIndex = Dedup.minhashBandTable(Dedup.minhashSignatures(newShingled))
    val plan = Dedup.incrementalPairs(corpusIndex, newIndex,
        corpusShingles.union(newShingled), 0.8)
      .queryExecution.executedPlan.toString
    plan should include(tmp)
    plan should not include "documents.parquet"
  }

  "minhashNearDupsIndexedPre" should "equal minhashNearDupsIndexed for the same batch, eager or lazy" in {
    import spark.implicits._
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = 250L
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-pre").toString
    Dedup.writeDedupIndex(real.filter(col("doc_id") < split), "text", "doc_id", tmp)
    val batch = real.filter(col("doc_id") >= split)
      .select(col("doc_id"), col("text"))
    val viaDocs = Dedup.minhashNearDupsIndexed(tmp, batch, "text", "doc_id", 0.8)
      .collect().map(_.toSeq).toSet
    // pre-built batch artifacts, as the compaction harness shares them
    val shingled = Dedup.docShingles(batch, "text", "doc_id").checkpointLinted()
    val bands = Dedup.minhashBandTable(Dedup.minhashSignatures(shingled))
      .checkpointLinted()
    val eager = Dedup.minhashNearDupsIndexedPre(tmp, shingled, bands, 0.8)
      .collect().map(_.toSeq).toSet
    val lazyOut = Dedup.minhashNearDupsIndexedPre(tmp, shingled, bands, 0.8,
        eager = false)
      .collect().map(_.toSeq).toSet
    eager shouldBe viaDocs
    lazyOut shouldBe viaDocs
    eager should not be empty
  }

  "dedupDecision" should "be invariant to the pairsMaterialized declaration on both components paths" in {
    import spark.implicits._
    val d = (1L to 40L).map(i => (i, s"doc ${i % 7} shares text ${i % 7}"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(d, "text", "doc_id", 0.8) // checkpointed
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    rows(Dedup.dedupDecision(d, pairs, "doc_id", pairsMaterialized = true)) shouldBe
      rows(Dedup.dedupDecision(d, pairs, "doc_id"))
    rows(Dedup.dedupDecision(d, pairs, "doc_id",
        maxLocalEdges = -1L, algorithm = "stars", pairsMaterialized = true)) shouldBe
      rows(Dedup.dedupDecision(d, pairs, "doc_id",
        maxLocalEdges = -1L, algorithm = "stars"))
  }

  "exactGroupsIncremental" should "classify batch docs against the corpus hash set" in {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val corpusHashes = corpus.select(sha2(lower(trim(col("text"))), 256).as("text_hash"))
    val batch = Seq(
      (10L, "alpha beta"),   // dup of corpus doc 1
      (11L, "epsilon zeta"), // new
      (12L, "epsilon zeta")  // dup within batch (11 wins)
    ).toDF("doc_id", "text")
    val out = Dedup.exactGroupsIncremental(corpusHashes, batch, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    out shouldBe Map(10L -> "dup_of_corpus", 11L -> "new", 12L -> "dup_in_batch")
  }

  "simhashNearDups" should "find exactly the brute-force hamming ball (banded recall = 1)" in {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val banded = Dedup.simhashNearDups(real, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Dedup.simhash(real, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 3
    } yield {
      val (x, y) = (sigs(i)._1, sigs(j)._1)
      (math.min(x, y), math.max(x, y), h)
    }).toSet
    banded shouldBe brute
    banded should not be empty
  }

  it should "include the exact duplicate at hamming 0" in {
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    pairs((1L, 4L)) shouldBe 0
  }

  it should "split a hot band into bounded block-pair tasks with identical pairs" in {
    import spark.implicits._
    // 40 identical docs → identical signatures → every (band, bits)
    // bucket holds all 40; maxGroup 8 → 5 blocks → 15 tasks per bucket
    val hot = (1L to 40L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    Similarity.numBlocks(40, 8) should be > 1
    val blocked = Dedup.simhashNearDups(hot, "text", "doc_id", maxHamming = 3, maxGroup = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneTask = Dedup.simhashNearDups(hot, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    blocked shouldBe oneTask
    blocked.size shouldBe 40 * 39 / 2
    blocked.map(_._3) shouldBe Set(0)
  }

  it should "keep the real-corpus pair set invariant under forced splitting" in {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val blocked = Dedup.simhashNearDups(real, "text", "doc_id", maxHamming = 3, maxGroup = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneTask = Dedup.simhashNearDups(real, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    blocked shouldBe oneTask
    blocked should not be empty
  }

  "connectedComponents" should "label every node with its component minimum" in {
    import spark.implicits._
    // chain 1-2-5 (transitive through 2), separate pair 7-8
    val pairs = Seq((2L, 1L), (2L, 5L), (7L, 8L)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comp shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 8L -> 7L)
  }

  it should "propagate labels across a long chain (diameter > 1 round)" in {
    import spark.implicits._
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    comp.values.toSet shouldBe Set(1L)
    comp.keySet shouldBe (1L to 10L).toSet
  }

  it should "fail loudly instead of returning unconverged labels" in {
    import spark.implicits._
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      // maxLocalEdges = -1 forces the iterative path (the single-task
      // union-find would solve a 9-edge chain without iterating)
      Dedup.connectedComponents(chain, maxIters = 2, maxLocalEdges = -1).collect()
    }
    e.getMessage should include("did not converge")
  }

  it should "agree with a driver union-find on a random graph" in {
    import spark.implicits._
    // deterministic pseudo-random sparse graph: 400 nodes, 300 edges →
    // a mix of singleton-free components, chains, and merged blobs
    val rng = new scala.util.Random(42)
    val edges = Seq.fill(300)((rng.nextInt(400).toLong, rng.nextInt(400).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: classic union-find
    val parent = Array.tabulate(400)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val want = nodes.map { n =>
      // component minimum = min over members of the union-find root class
      val root = find(n.toInt)
      n -> nodes.filter(m => find(m.toInt) == root).min
    }.toMap
    got shouldBe want
  }

  it should "label identically via the local union-find and iterative paths" in {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(250)((rng.nextInt(300).toLong, rng.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairs) // 250 edges → local path
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iterative = Dedup.connectedComponents(pairs, maxLocalEdges = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    local shouldBe iterative
    local should not be empty
  }

  "connectedComponentsStars" should "agree with both existing paths on a random graph" in {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val pairs = Seq.fill(250)((rng.nextInt(300).toLong, rng.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val label = Dedup.connectedComponents(pairs, maxLocalEdges = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stars = Dedup.connectedComponents(
        pairs, maxLocalEdges = -1, algorithm = "stars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    stars shouldBe local
    stars shouldBe label
    stars should not be empty
  }

  it should "converge on a high-diameter chain in far fewer rounds than propagation" in {
    import spark.implicits._
    // a 41-node chain: min-label propagation needs 40 rounds (one per
    // unit of diameter) and provably cannot finish in 10; the star
    // contraction is diameter-independent and converges within 10
    val chain = (1L until 41L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 10, maxLocalEdges = -1).collect()
    }
    val stars = Dedup.connectedComponents(
        chain, maxIters = 10, maxLocalEdges = -1, algorithm = "stars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    stars.keySet shouldBe (1L to 41L).toSet
    stars.values.toSet shouldBe Set(1L)
  }

  it should "handle multi-component graphs with shared minima shapes" in {
    import spark.implicits._
    // two stars already centered + a triangle + an isolated pair,
    // deliberately including duplicate and reversed input edges
    val pairs = Seq(
      (2L, 1L), (3L, 1L), (1L, 4L),          // star on 1
      (10L, 11L), (11L, 12L), (12L, 10L),    // triangle
      (20L, 21L), (21L, 20L), (20L, 21L)     // pair with dupes/reverses
    ).toDF("doc_a", "doc_b")
    val stars = Dedup.connectedComponents(
        pairs, maxLocalEdges = -1, algorithm = "stars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    stars shouldBe Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
  }

  "dedupDecision" should "keep exactly one survivor per cluster" in {
    import spark.implicits._
    val corpus = (1L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 1L), (2L, 5L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupDecision(corpus, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    out.length shouldBe 9
    val keep = out.filter(_._3).map(_._1).toSet
    keep shouldBe Set(1L, 3L, 4L, 6L, 7L, 9L) // cluster minima + singletons
    out.find(_._1 == 5L).get._2 shouldBe 1L    // transitive member → min label
  }

  "sharedSpans" should "measure the longest shared token run per pair" in {
    import spark.implicits._
    // docs 1 & 2 share a 7-token run (plus an unrelated 3-token echo);
    // docs 1 & 3 share exactly one 3-gram; doc 4 matches nothing
    val run7 = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"intro words $run7 tail one"),
      (2L, s"different opening $run7 and alpha beta gamma closing"),
      (3L, "totally other text alpha beta gamma elsewhere now"),
      (4L, "nothing in common with the rest at all")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val rows = Dedup.sharedSpans(docs, pairs, "text", "doc_id", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (span, start_a, start_b): run7 starts after "intro words" (pos 2)
    // in doc 1 and after "different opening" (pos 2) in doc 2; the
    // 3-token echo island loses the tie-break to the 7-token run
    rows shouldBe Map(
      (1L, 2L) -> ((7L, 2L, 2L)),
      (1L, 3L) -> ((3L, 2L, 3L))) // no row for (1,4)
  }

  it should "survive repeated-token documents and offset islands" in {
    import spark.implicits._
    // all-same-token docs: every position matches every position, and
    // the best island is the full shorter document
    val docs = Seq(
      (1L, "x x x x x x"),          // 6 tokens
      (2L, "x x x x")               // 4 tokens
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val spans = Dedup.sharedSpans(docs, pairs, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    spans shouldBe Map((1L, 2L) -> 4L)
  }

  "exciseSpans" should "cut each doc's best span and empty out full covers" in {
    import spark.implicits._
    val run7 = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"intro words $run7 tail one"),
      (2L, s"different opening $run7 and alpha beta gamma closing"),
      (5L, "a b c d"),
      (6L, "a b c d")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    val spans = Dedup.sharedSpans(docs, pairs, "text", "doc_id", n = 3)
    val out = Dedup.exciseSpans(docs, spans, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    out shouldBe Map(
      2L -> ((7L, "different opening and alpha beta gamma closing")),
      6L -> ((4L, ""))) // exact dup: the whole doc is the span
  }
}
