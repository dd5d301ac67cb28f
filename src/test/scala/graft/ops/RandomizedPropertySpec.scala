package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic randomized property tests (fixed seeds, plain Random —
  * the scalacheck runner bridge isn't available offline, and these are
  * exhaustive enough batched through one Spark job per property). */
class RandomizedPropertySpec extends SparkSpec {

  private val words =
    Array("alpha", "beta", "Gamma", "DELTA", "e", "zeta42", "eta,x", "th_eta")
  private val ws = Array(" ", "  ", "\t", "\n", " \t ", "\r\n")

  private def randomText(rng: scala.util.Random): String = {
    val n = rng.nextInt(120)
    val sb = new StringBuilder
    if (rng.nextBoolean()) sb.append(ws(rng.nextInt(ws.length)))
    var i = 0
    while (i < n) {
      sb.append(words(rng.nextInt(words.length)))
      sb.append(ws(rng.nextInt(ws.length)))
      i += 1
    }
    if (rng.nextBoolean()) sb.setLength(math.max(0, sb.length - 1))
    sb.toString
  }

  "Text.chunks" should "satisfy the window invariants on random texts (vs reference impl)" in {
    import spark.implicits._
    val rng = new scala.util.Random(1234)
    val texts = (0L until 200L).map(i => (i, randomText(rng)))
    val (size, overlap) = (7, 3)
    val step = size - overlap

    val got = Text.chunks(texts.toDF("doc_id", "text"), "text", "doc_id", size, overlap)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }

    texts.foreach { case (id, text) =>
      // reference: plain Scala mirroring the ENGINE tokenization
      // contract exactly — Spark's trim() strips only ' ' (not \t\n),
      // and split(col, pat) is limit -1, which KEEPS empty boundary
      // tokens produced by leading/trailing non-space whitespace. A
      // blank text tokenizes to [""], one empty token → one empty
      // chunk (same in DuckDB).
      val sparkTrimmed = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val toks = java.util.regex.Pattern.compile("\\s+")
        .split(sparkTrimmed.toLowerCase, -1).toIndexedSeq
      val n = toks.length
      val chunks = got.getOrElse(id, Array.empty)
      val expectedK = math.max(1, math.ceil((n - overlap).toDouble / step).toInt)
      chunks.map(_._2).toSeq shouldBe (0 until expectedK)
      chunks.foreach { case (_, idx, textOut, nTokens) =>
        val start = idx * step
        val expect = toks.slice(start, math.min(start + size, n))
        textOut shouldBe expect.mkString(" ")
        nTokens shouldBe expect.length
      }
      // coverage: union of chunk windows is exactly [0, n)
      val last = chunks.last
      last._2 * step + last._4 shouldBe n
    }
  }

  "WordShingleHashes" should "equal xxhash64 over string shingles on whitespace-fuzzed texts" in {
    import spark.implicits._
    graft.functions.WordShingles.register(spark)
    graft.functions.WordShingleHashes.register(spark)
    val rng = new scala.util.Random(4321)
    val texts = (0L until 300L).map(i => (i, randomText(rng)))
    val df = texts.toDF("doc_id", "text")
    val mismatches = df.selectExpr(
        "doc_id",
        "word_shingle_hashes(text, 3) AS native",
        "transform(word_shingles(text, 3), s -> xxhash64(s)) AS via_strings")
      .filter(!(col("native") <=> col("via_strings")))
      .count()
    mismatches shouldBe 0L
  }

  "SimHash64" should "equal the aggregate twin on whitespace-fuzzed texts" in {
    import spark.implicits._
    val rng = new scala.util.Random(9999)
    // blanks included: both forms vote on the empty boundary token of
    // a blank document (explode of [""] on the aggregate side), so
    // every doc must agree wherever the aggregate emits a row
    val texts = (0L until 200L).map(i => (i, randomText(rng)))
    val df = texts.toDF("doc_id", "text")
    val native = Dedup.simhash(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = Dedup.simhashAgg(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // strict: BOTH forms must cover every doc (a regression that drops
    // rows from either side must fail, not vacuously pass)
    native.size shouldBe 200
    agg.size shouldBe 200
    agg.foreach { case (id, sig) => native(id) shouldBe sig }
  }

  "hammingNearDupsIncremental" should "equal full mining restricted to batch pairs on random signatures" in {
    import spark.implicits._
    for (seed <- Seq(5, 55); maxHamming <- Seq(0, 3, 15)) {
      val rng = new scala.util.Random(seed)
      // cluster signatures around a few random centers (bit-flip noise)
      // so the hamming ball is non-trivially populated at every bound
      val centers = Array.fill(6)(rng.nextLong())
      val sigs = (0L until 120L).map { i =>
        var s = centers(rng.nextInt(centers.length))
        val flips = rng.nextInt(6)
        for (_ <- 0 until flips) s ^= (1L << rng.nextInt(64))
        (i, s)
      }
      val df = sigs.toDF("doc_id", "phash")
      val corpus = df.filter(col("doc_id") < 60)
      val batch = df.filter(col("doc_id") >= 60)
      val inc = Dedup.hammingNearDupsIncremental(
          corpus, batch, "doc_id", "phash", maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val full = Dedup.hammingNearDups(df, "doc_id", "phash", maxHamming)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      inc shouldBe full.filter(p => p._1 >= 60 || p._2 >= 60)
      // brute-force ground truth for the full miner itself
      val brute = (for {
        (a, sa) <- sigs; (b, sb) <- sigs
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= maxHamming
      } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
      full shouldBe brute
    }
  }

  "decontaminate" should "equal a set-based reference on random corpora" in {
    import spark.implicits._
    val rng = new scala.util.Random(777)
    // small vocabulary + short docs → plenty of genuine 3-gram overlap
    val vocab = Array("a", "b", "c", "d", "e")
    def doc(): String =
      (0 until (3 + rng.nextInt(8))).map(_ => vocab(rng.nextInt(vocab.length))).mkString(" ")
    val n = 3
    val cands = (0L until 60L).map(i => (i, doc()))
    val evs = (1000L until 1010L).map(i => (i, doc()))

    def grams(t: String): Set[String] =
      t.split("\\s+").toSeq.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    val evalGrams = evs.flatMap(e => grams(e._2)).toSet
    val expected = cands.map { case (id, t) =>
      val ov = grams(t).count(evalGrams.contains)
      (id, ov.toLong, ov >= 1)
    }

    val got = Dedup.decontaminate(
        cands.toDF("doc_id", "text"), evs.toDF("doc_id", "text"),
        "text", "doc_id", n = n)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    got shouldBe expected
    // non-vacuity of the property itself: both outcomes occur
    expected.count(_._3) should be > 0
    expected.count(!_._3) should be > 0
  }

  "connectedComponents" should "agree across local, iterative, and stars paths on random graphs" in {
    import spark.implicits._
    for (seed <- Seq(7, 77, 777)) {
      val rng = new scala.util.Random(seed)
      val nNodes = 50 + rng.nextInt(200)
      val nEdges = rng.nextInt(2 * nNodes)
      val pairs = Seq.fill(nEdges)(
          (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (pairs.nonEmpty) {
        val df = pairs.toDF("doc_a", "doc_b")
        val local = Dedup.connectedComponents(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val iter = Dedup.connectedComponents(df, maxLocalEdges = -1)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val stars = Dedup.connectedComponents(
            df, maxLocalEdges = -1, algorithm = "stars")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        local shouldBe iter
        stars shouldBe iter
        local should not be empty
      }
    }
  }
}
