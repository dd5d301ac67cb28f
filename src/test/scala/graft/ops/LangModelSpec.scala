package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral contract of the bigram-LM scorer: predictable word
  * sequences cost less than corpus-atypical ones, bigram accounting is
  * exact, sub-bigram docs are absent, and scores are
  * partitioning-stable. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // 8 fluent docs: the bigrams "the cat", "cat sat", "sat down"
    // dominate the census
    (1L, "the cat sat down"), (2L, "the cat sat down"),
    (3L, "the cat sat down"), (4L, "the cat sat down"),
    (5L, "the cat sat down"), (6L, "the cat sat down"),
    (7L, "the cat sat down"), (8L, "the cat sat down"),
    (9L, "down sat cat the"), // reversed: every bigram is rare
    (10L, "single")           // one token: no bigrams
  ).toDF("doc_id", "text")

  behavior of "LangModel.lmScores"

  it should "score corpus-typical sequences below atypical ones" in {
    val out = LangModel.lmScores(corpus, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    out.keySet shouldBe (1L to 9L).toSet // doc 10 has no bigrams
    out(1L)._1 shouldBe 3L               // "the cat","cat sat","sat down"
    out(9L)._1 shouldBe 3L
    // fluent doc must cost strictly less than the reversed doc
    out(1L)._2 should be < out(9L)._2
    // all fluent copies score identically
    (2L to 8L).foreach(d => out(d) shouldBe out(1L))
  }

  it should "compute the kernel path value-equal to the declarative twin" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = LangModel.lmScores(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = LangModel.lmScoresDeclarative(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  behavior of "LangModel.lmScoresTopK"

  it should "equal the full-census scorer when K covers the census" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val census = LangModel.bigramCensus(docs, col("text"), col("doc_id")).count()
    val full = LangModel.lmScores(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val topk = LangModel.lmScoresTopK(docs, col("text"), col("doc_id"),
        k = census.toInt + 10)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    topk shouldBe full
  }

  it should "bound the broadcast model by K (pruned bigrams absent)" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val census = LangModel.bigramCensus(docs, col("text"), col("doc_id")).count()
    census should be > 64L // the cut below is a real prune
    val m = LangModel.buildModel(docs, col("text"), topK = Some(64))
    m.model.size shouldBe 64 // exactly K survivors, nothing else
    // pruned bigrams score through the UNK fallback, which must carry
    // every context — vocab-sized, the documented bound
    m.unk.size should be > 0
  }

  it should "break count ties at the K boundary in code-point order" in {
    // U+FF61 (BMP, UTF-16 unit 0xFF61) vs U+10000 (surrogate pair
    // starting 0xD800): Java String order puts U+FF61 AFTER the
    // supplementary char, code-point/UTF-8 order puts it BEFORE — the
    // DuckDB-portable collation must keep "a ｡" at k = 1
    val ties = Seq((1L, "a ｡"), (2L, "a 𐀀"))
      .toDF("doc_id", "text")
    val m = LangModel.buildModel(ties, col("text"), topK = Some(1))
    m.model.size shouldBe 1
    m.model.containsKey("a ｡") shouldBe true
  }

  behavior of "LangModel.lmScoresIndexed"

  it should "score through the persisted model exactly like lmScores" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = freshDir("lm_index")
    LangModel.writeLmModel(docs, col("text"), base)
    val indexed = LangModel.lmScoresIndexed(docs, col("text"),
        col("doc_id"), base)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val direct = LangModel.lmScores(docs, col("text"), col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    indexed shouldBe direct
  }

  it should "score unseen contexts at the ln(V) floor cross-corpus" in {
    val train = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val base = freshDir("lm_xcorpus")
    LangModel.writeLmModel(train, col("text"), base)
    // entirely-unseen vocabulary: every bigram takes the floor ln(V)
    val other = Seq((9L, "zork blap quux")).toDF("doc_id", "text")
    val r = LangModel.lmScoresIndexed(other, col("text"), col("doc_id"), base)
      .collect().head
    val v = 5.0 // the, cat, sat, on, mat
    val floor = LangModel.quantizeCost(math.log(v)).doubleValue()
    r.getLong(1) shouldBe 2L
    r.getDouble(3) shouldBe (floor +- 1e-12)
  }

  it should "append a batch to exactly the one-shot model of the union" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("doc_id") % 3 === 0)
    val b = docs.filter(col("doc_id") % 3 =!= 0)
    def modelRows(path: String) = Seq("model", "unk", "meta").map(t =>
      spark.read.parquet(s"$path/$t").collect()
        .map(_.toSeq).toSet)
    // full-census append
    val incr = freshDir("lm_append")
    LangModel.writeLmModel(a, col("text"), incr)
    LangModel.appendLmModel(b, col("text"), incr)
    val oneShot = freshDir("lm_oneshot")
    LangModel.writeLmModel(docs, col("text"), oneShot)
    modelRows(incr) shouldBe modelRows(oneShot)
    // top-K append: the cut recomputes over the MERGED census
    val incrK = freshDir("lm_append_k")
    LangModel.writeLmModel(a, col("text"), incrK, topK = Some(64))
    LangModel.appendLmModel(b, col("text"), incrK)
    val oneShotK = freshDir("lm_oneshot_k")
    LangModel.writeLmModel(docs, col("text"), oneShotK, topK = Some(64))
    modelRows(incrK) shouldBe modelRows(oneShotK)
  }

  it should "recover a mid-swap aside before reading or appending" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = freshDir("lm_aside") + "/model"
    LangModel.writeLmModel(docs, col("text"), path)
    val expected = LangModel.lmScoresIndexed(docs, col("text"),
        col("doc_id"), path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // simulate the replaceDir crash window: index parked in .old
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".old")) shouldBe true
    LangModel.lmScoresIndexed(docs, col("text"), col("doc_id"), path)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq shouldBe expected
    new java.io.File(path + ".old").exists() shouldBe false
  }

  it should "persist the top-K cut when asked" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = freshDir("lm_index_topk")
    LangModel.writeLmModel(docs, col("text"), base, topK = Some(64))
    spark.read.parquet(s"$base/model").count() shouldBe 64
    spark.read.parquet(s"$base/meta").head().getInt(1) shouldBe 64
  }

  it should "be bit-stable under repartitioning" in {
    val a = LangModel.lmScores(corpus, col("text"), col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = LangModel.lmScores(corpus.repartition(5, col("text")),
      col("text"), col("doc_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  behavior of "LangModel.collocations"

  it should "score a perfect collocation at exactly 1 and bound the rest" in {
    import spark.implicits._
    // "a b" 5×: a appears only before b, b only after a → NPMI = 1.
    // "x y"/"x z" split x's left mass → "x y" lands strictly below 1.
    val docs = (
      (1 to 5).map(i => (i.toLong, "a b")) ++
      (6 to 8).map(i => (i.toLong, "x y")) ++
      (9 to 10).map(i => (i.toLong, "x z"))
    ).toDF("doc_id", "text")
    val out = LangModel.collocations(docs, col("text"), col("doc_id"),
      minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byBigram = out.map(t => t._1 -> t._3).toMap
    byBigram("a b") shouldBe 1.0
    byBigram("x y") should be < 1.0
    byBigram("x y") should be > 0.0
    out.foreach { case (_, _, npmi) =>
      npmi should (be <= 1.0 and be >= -1.0)
    }
    // minCount excludes the 2-occurrence "x z"? No — it passes at 2;
    // the board is ordered npmi desc with the perfect pair on top
    out.head._1 shouldBe "a b"
  }

  it should "mine an identical board under repartitioning" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = LangModel.collocations(docs, col("text"), col("doc_id"))
      .collect().map(_.toSeq).toSeq
    val b = LangModel.collocations(docs.repartition(7), col("text"), col("doc_id"))
      .collect().map(_.toSeq).toSeq
    a shouldBe b
  }
}
