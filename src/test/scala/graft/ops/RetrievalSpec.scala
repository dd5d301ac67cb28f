package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft.ops.Retrieval — persisted inverted index + conjunctive BM25. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple banana banana"),
    (3L, "apple cherry cherry date"),
    (4L, "banana date date"),
    (5L, "apple apple apple banana cherry date")
  ).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  behavior of "Retrieval.search"

  it should "enforce conjunctive semantics" in {
    // head terms by df: apple(4) banana(4) cherry(3) date(3) →
    // q1 = {apple, banana}, q2 = {cherry, date}
    val out = Retrieval.search(corpus, "text", "doc_id", q = 2, k = 10)
    val byQ = out.collect().groupBy(_.getInt(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    byQ(1) shouldBe Set(1L, 2L, 5L) // contain both apple AND banana
    byQ(2) shouldBe Set(3L, 5L)     // contain both cherry AND date
  }

  it should "rank higher-tf docs above longer ones and respect k" in {
    val out = Retrieval.search(corpus, "text", "doc_id", q = 2, k = 1)
    out.count() shouldBe 2 // one row per query
    out.collect().foreach(_.getInt(1) shouldBe 1)
  }

  it should "break head-term ties deterministically" in {
    val a = Retrieval.search(corpus, "text", "doc_id", q = 2, k = 5)
    val b = Retrieval.search(corpus.repartition(7), "text", "doc_id", q = 2, k = 5)
    rows(a) shouldBe rows(b)
  }

  behavior of "Retrieval.searchPhrase"

  it should "require adjacency, not co-occurrence" in {
    val docs = Seq(
      (1L, "red fox red fox"),   // "red fox" twice, short doc
      (2L, "red fox eats"),      // "red fox" once
      (3L, "fox saw red paint"), // both words, NEVER adjacent
      (4L, "red red red")        // head word only
    ).toDF("doc_id", "text")
    // phrase vocabulary df: "red fox"(2) is the most doc-frequent
    // bigram; query 1 = that phrase
    val out = Retrieval.searchPhrase(docs, "text", "doc_id", q = 1, k = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val q1 = out.filter(_._1 == 1).map(_._3).toSet
    q1 shouldBe Set(1L, 2L)            // doc 3 co-occurs but never adjacent
    out.find(_._3 == 1L).get._2 shouldBe 1 // tf=2 outranks tf=1
  }

  it should "be deterministic under repartitioning" in {
    val a = Retrieval.searchPhrase(corpus, "text", "doc_id", q = 3, k = 5)
    val b = Retrieval.searchPhrase(corpus.repartition(7), "text", "doc_id", q = 3, k = 5)
    rows(a) shouldBe rows(b)
  }

  behavior of "Retrieval.searchOr"

  it should "admit any-term matches and contain the conjunctive set" in {
    val or = Retrieval.searchOr(corpus, "text", "doc_id", q = 2, k = 10)
    val and = Retrieval.search(corpus, "text", "doc_id", q = 2, k = 10)
    val orByQ = or.collect().groupBy(_.getInt(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    // q1 = {apple, banana}: every doc carries at least one of them;
    // q2 = {cherry, date}: doc 2 carries neither
    orByQ(1) shouldBe Set(1L, 2L, 3L, 4L, 5L)
    orByQ(2) shouldBe Set(1L, 3L, 4L, 5L)
    val andByQ = and.collect().groupBy(_.getInt(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    andByQ.foreach { case (q, s) => s.subsetOf(orByQ(q)) shouldBe true }
  }

  it should "score single-term matches with just that term's contribution" in {
    // doc 4 = "banana date date" has banana but not apple: present in
    // OR results for q1={apple,banana}, absent from conjunctive
    val or = Retrieval.searchOr(corpus, "text", "doc_id", q = 2, k = 10)
      .filter(col("query_id") === 1).collect().map(_.getLong(2)).toSet
    val and = Retrieval.search(corpus, "text", "doc_id", q = 2, k = 10)
      .filter(col("query_id") === 1).collect().map(_.getLong(2)).toSet
    (or -- and) should contain(4L)
  }

  behavior of "Retrieval.searchHybridRrf"

  it should "produce at most k rows per query with dense ranks" in {
    val out = Retrieval.searchHybridRrf(corpus, "text", "doc_id", q = 2, k = 3)
    val byQ = out.collect().groupBy(_.getInt(0))
    byQ.foreach { case (_, rs) =>
      rs.length should be <= 3
      rs.map(_.getInt(1)).sorted shouldBe (1 to rs.length).toArray
    }
  }

  it should "be partition-invariant" in {
    def runOn(df: org.apache.spark.sql.DataFrame) =
      Retrieval.searchHybridRrf(df, "text", "doc_id", q = 2, k = 5)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    runOn(corpus) shouldBe runOn(corpus.repartition(7))
  }

  behavior of "Retrieval.searchPrfRerank"

  it should "degrade to pure BM25 order when no candidate has a vector" in {
    import spark.implicits._
    val emb = Seq((999L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val prf = Retrieval.searchPrfRerank(corpus, emb, "text", "doc_id",
      "vec_id", "embedding", q = 2, k = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val bm = Retrieval.search(corpus, "text", "doc_id", q = 2, k = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    prf.toSeq shouldBe bm.toSeq
  }

  it should "re-rank by cosine to the best embedded hit and keep vector-less candidates" in {
    import spark.implicits._
    // only docs 2 and 5 carry vectors; probe for q1 is its best-ranked
    // embedded candidate, all 3 conjunctive candidates stay in the list
    val emb = Seq(
      (2L, Array(1f, 0f)), (5L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = Retrieval.searchPrfRerank(corpus, emb, "text", "doc_id",
      "vec_id", "embedding", q = 2, k = 10)
    val q1 = out.filter(col("query_id") === 1)
      .collect().map(r => (r.getLong(2), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    q1.map(_._1).toSet shouldBe Set(1L, 2L, 5L) // full conjunctive set
    val cosById = q1.toMap
    cosById(1L) shouldBe None          // no vector → lexical only
    cosById(2L).isDefined shouldBe true
    cosById(5L).isDefined shouldBe true
    // partition invariance of the whole cascade
    val a = out.collect().map(_.toSeq).toSeq
    val b = Retrieval.searchPrfRerank(corpus.repartition(7), emb, "text",
      "doc_id", "vec_id", "embedding", q = 2, k = 10)
      .collect().map(_.toSeq).toSeq
    b shouldBe a
  }

  behavior of "Retrieval.searchIndexed"

  it should "match the in-memory search after an artifact round-trip" in {
    val path = freshDir("retrieval-roundtrip")
    Retrieval.writeSearchIndex(corpus, "text", "doc_id", path)
    val direct = rows(Retrieval.search(corpus, "text", "doc_id", q = 2, k = 5))
    val indexed = rows(Retrieval.searchIndexed(spark, path, q = 2, k = 5))
    indexed shouldBe direct
  }

  it should "score an appended disjoint batch identically to a one-shot build" in {
    val path = freshDir("retrieval-incremental")
    Retrieval.writeSearchIndex(
      corpus.filter(col("doc_id") <= 2), "text", "doc_id", path, batch = 0)
    Retrieval.appendSearchIndex(
      corpus.filter(col("doc_id") > 2), "text", "doc_id", path, batch = 1)
    val oneShot = rows(Retrieval.search(corpus, "text", "doc_id", q = 2, k = 5))
    rows(Retrieval.searchIndexed(spark, path, q = 2, k = 5)) shouldBe oneShot
  }

  it should "be replay-idempotent: rewriting a batch leaves scores unchanged" in {
    val path = freshDir("retrieval-replay")
    Retrieval.writeSearchIndex(
      corpus.filter(col("doc_id") <= 2), "text", "doc_id", path, batch = 0)
    Retrieval.appendSearchIndex(
      corpus.filter(col("doc_id") > 2), "text", "doc_id", path, batch = 1)
    val before = rows(Retrieval.searchIndexed(spark, path, q = 2, k = 5))
    // an at-least-once replay re-delivers batch 1; overwrite on the
    // batch dir must make it a value no-op
    Retrieval.appendSearchIndex(
      corpus.filter(col("doc_id") > 2), "text", "doc_id", path, batch = 1)
    rows(Retrieval.searchIndexed(spark, path, q = 2, k = 5)) shouldBe before
  }

  it should "serve identical scores from a compacted index with a single epoch left" in {
    val path = freshDir("retrieval-compact")
    Retrieval.writeSearchIndex(
      corpus.filter(col("doc_id") <= 2), "text", "doc_id", path, batch = 0)
    Retrieval.appendSearchIndex(
      corpus.filter(col("doc_id") === 3 || col("doc_id") === 4),
      "text", "doc_id", path, batch = 1)
    Retrieval.appendSearchIndex(
      corpus.filter(col("doc_id") === 5), "text", "doc_id", path, batch = 2)
    val before = rows(Retrieval.searchIndexed(spark, path, q = 2, k = 5))
    Retrieval.compactSearchIndex(spark, path)
    rows(Retrieval.searchIndexed(spark, path, q = 2, k = 5)) shouldBe before
    // one epoch per family, no batch=K leftovers
    Seq("postings", "doclen", "vocab", "stats").foreach { fam =>
      val dirs = new java.io.File(s"$path/$fam").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      dirs shouldBe Set("batch=-1")
    }
    // stats really folded: one row carrying the full corpus
    val st = spark.read.parquet(s"$path/stats")
    st.count() shouldBe 1
    st.head().getLong(0) shouldBe 5L
  }

  behavior of "Retrieval plan shape"

  it should "derive standing queries through a distributed head-cut, not a global vocab window" in {
    // the r13 scale-killer: row_number over the FULL vocabulary with no
    // partitionBy moved the whole term (or near-corpus-sized shingle)
    // census to one task. The lint bounds every empty-partitionSpec
    // window by a limit/TakeOrdered in its subtree.
    graft.tools.PlanLint.lint(
      Retrieval.search(corpus, "text", "doc_id", q = 2, k = 5)) shouldBe empty
    graft.tools.PlanLint.lint(
      Retrieval.searchOr(corpus, "text", "doc_id", q = 2, k = 5)) shouldBe empty
    graft.tools.PlanLint.lint(
      Retrieval.searchHybridRrf(corpus, "text", "doc_id", q = 2, k = 3)) shouldBe empty
    // head-cut plans themselves: TakeOrderedAndProject, never a
    // single-partition sort of the vocab
    val (_, _, vocab, _) = Retrieval.indexFrames(corpus, "text", "doc_id")
    val headPlan = Retrieval.headTermQueries(vocab, 2)
      .queryExecution.executedPlan.toString
    headPlan should include("TakeOrderedAndProject")
    graft.tools.PlanLint.lint(Retrieval.headTermQueries(vocab, 2)) shouldBe empty
    graft.tools.PlanLint.lint(Retrieval.headPhraseQueries(vocab, 2)) shouldBe empty
  }

  it should "partition-prune the postings scan to the query terms' shards" in {
    val path = freshDir("retrieval-prune")
    Retrieval.writeSearchIndex(corpus, "text", "doc_id", path)
    val plan = Retrieval.prunedPostingsFrame(spark, path, Seq("apple"))
      .queryExecution.executedPlan.toString
    // single term → Catalyst simplifies isin to =; multi-term stays IN
    plan should include regex """PartitionFilters: \[[^\]]*shard#\d+ (IN|=)"""
    // and the term filter reaches the parquet scan
    plan should include("PushedFilters")
  }
}
