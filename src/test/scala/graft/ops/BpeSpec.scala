package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE contracts beyond the oracle replay: greedy-fuse semantics on
  * overlap runs, code-point tie order (the UTF-16 divergence case),
  * merge-table invariants, determinism, and character-mass
  * conservation through the distributed encode. */
class BpeSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  it should "fuse greedy-leftmost over overlap runs" in {
    def f(s: String, a: String, b: String) =
      Bpe.fuse(s.map(_.toString).toArray, a, b).mkString("|")
    f("aaa", "a", "a") shouldBe "aa|a"
    f("aaaa", "a", "a") shouldBe "aa|aa"
    f("aaaaa", "a", "a") shouldBe "aa|aa|a"
    f("abab", "a", "b") shouldBe "ab|ab"
    f("aab", "a", "b") shouldBe "a|ab"
    f("xyz", "a", "b") shouldBe "x|y|z"
  }

  it should "compare by code points where UTF-16 order diverges" in {
    val smile = new String(Character.toChars(0x1F600)) // supplementary
    val high = "￿"                                // BMP max
    // Java UTF-16 order puts the surrogate pair FIRST; UTF-8 binary
    // (= DuckDB collation) puts the larger code point last
    (smile.compareTo(high) < 0) shouldBe true
    (Bpe.cpCompare(smile, high) > 0) shouldBe true
    Bpe.cpCompare("ab", "ab") shouldBe 0
    (Bpe.cpCompare("ab", "abc") < 0) shouldBe true
  }

  it should "train the hand-derivable first merge on a toy census" in {
    val census = Array(
      ("aaa".map(_.toString).toArray, 2L),
      ("banana".map(_.toString).toArray, 2L),
      ("bb".map(_.toString).toArray, 2L))
    val merges = Bpe.trainMerges(census, 3)
    // (a,a) appears twice per "aaa" occurrence -> 4; (a,n)/(n,a) = 4
    // too but (a,a) wins the code-point tie-break
    merges(0).lhs shouldBe "a"
    merges(0).rhs shouldBe "a"
    merges(0).cnt shouldBe 4L
    merges.map(_.rank).toSeq shouldBe (1 to merges.length)
    merges.foreach { m =>
      m.merged shouldBe (m.lhs + m.rhs)
      m.cnt should be > 0L
    }
  }

  it should "train deterministically on the corpus" in {
    val m1 = Bpe.train(docs, k = 12, cap = 256)
    val m2 = Bpe.train(docs, k = 12, cap = 256)
    m1.map(m => (m.rank, m.lhs, m.rhs, m.cnt)).toSeq shouldBe
      m2.map(m => (m.rank, m.lhs, m.rhs, m.cnt)).toSeq
    m1.length shouldBe 12
  }

  it should "conserve character mass through the distributed encode" in {
    // sum over tokens of cnt * |token| must equal the corpus's total
    // word-character mass: fusion concatenates, never drops
    val strlen = org.apache.spark.sql.functions.length _
    val charMass = Bpe.wordCensus(docs)
      .select(sum(col("freq") * strlen(col("word")))).head().getLong(0)
    val tokMass = Bpe.tokenFrequencies(docs, k = 12, cap = 256, top = 1000000)
      .select(sum(col("cnt") * strlen(col("token")))).head().getLong(0)
    tokMass shouldBe charMass
  }

  it should "encode identically from the persisted tokenizer artifact" in {
    val base = freshDir("bpe-model-roundtrip")
    Bpe.writeBpeModel(spark, docs, base, k = 12, cap = 256)
    val loaded = Bpe.loadMerges(spark, base)
    val trained = Bpe.train(docs, k = 12, cap = 256)
    loaded.toSeq shouldBe trained.toSeq
    val direct = Bpe.tokenFrequencies(docs, k = 12, cap = 256)
      .collect().map(_.toSeq)
    val indexed = Bpe.tokenFrequenciesIndexed(docs, base)
      .collect().map(_.toSeq)
    indexed.toSeq shouldBe direct.toSeq
  }

  it should "append a batch bit-identically to a one-shot build" in {
    val oneShot = freshDir("bpe-model-oneshot")
    val incr = freshDir("bpe-model-incr")
    Bpe.writeBpeModel(spark, docs, oneShot, k = 12, cap = 256)
    Bpe.writeBpeModel(spark, docs.filter(col("doc_id") % 2 === 0),
      incr, k = 12, cap = 256)
    Bpe.appendBpeModel(docs.filter(col("doc_id") % 2 =!= 0), incr)
    Bpe.loadMerges(spark, incr).toSeq shouldBe
      Bpe.loadMerges(spark, oneShot).toSeq
  }

  it should "recover a mid-swap aside before reading" in {
    val base = freshDir("bpe-model-aside")
    Bpe.writeBpeModel(spark, docs, base, k = 12, cap = 256)
    val m = Bpe.loadMerges(spark, base)
    val f = new java.io.File(base)
    assert(f.renameTo(new java.io.File(base + ".old")))
    Bpe.loadMerges(spark, base).toSeq shouldBe m.toSeq
  }

  it should "replay merges identically to the training fusion" in {
    val m = Bpe.train(docs, k = 12, cap = 64)
    // re-run the training loop and capture final states, then check
    // applyMerges reproduces them word by word
    val vocab = Bpe.wordCensus(docs)
      .orderBy(col("freq").desc, col("word").asc).limit(64)
      .collect().map(r => r.getString(0))
    vocab.foreach { w =>
      val replay = Bpe.applyMerges(w, m).mkString("|")
      val direct = m.foldLeft(Bpe.codePointSplit(w))((t, mm) =>
        Bpe.fuse(t, mm.lhs, mm.rhs)).mkString("|")
      replay shouldBe direct
    }
  }
}
