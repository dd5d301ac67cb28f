package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance-resampling contracts: weights separate target-like
  * from non-target-like text, the K-covering prune equals the exact
  * scorer, selection respects the (weight, doc_id) order, and the
  * Gumbel sampler is seed-deterministic and weight-biased. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def testDocs = {
    // target: repeated English-ish phrasing; near-target: shares the
    // target's bigrams; off-target: disjoint vocabulary
    val tgt = (1L to 6L).map(i =>
      (i, "en", "the model learns from the data and the data grows"))
    val near = Seq((10L, "xx", "the model learns from the data quickly"))
    val far = Seq((11L, "xx", "zork blap quux fizz wibble gromp snark blip"))
    (tgt ++ near ++ far).toDF("doc_id", "lang", "text")
  }

  behavior of "Dsir.importanceWeights"

  it should "weight target-like documents above off-target ones" in {
    val w = Dsir.importanceWeights(testDocs, col("text"), col("doc_id"),
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // near-target doc shares the target's bigrams → high avg weight;
    // the disjoint doc bottoms out on the target UNK/floor costs
    w(10L) should be > w(11L)
  }

  it should "mark target membership and drop evidence-free docs" in {
    val docs = testDocs.union(Seq((99L, "xx", "one")).toDF("doc_id", "lang", "text"))
    val rows = Dsir.importanceWeights(docs, col("text"), col("doc_id"),
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.keySet should not contain 99L // <2 tokens → no bigrams
    rows(1L) shouldBe true
    rows(10L) shouldBe false
  }

  it should "equal the exact scorer when K covers both censuses" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val census = LangModel.bigramCensus(docs, col("text"), col("doc_id")).count()
    val full = Dsir.importanceWeights(docs, col("text"), col("doc_id"),
        col("lang") === "en")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val pruned = Dsir.importanceWeights(docs, col("text"), col("doc_id"),
        col("lang") === "en", topK = Some(census.toInt + 10))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    pruned shouldBe full
  }

  behavior of "Dsir.importanceWeightsIndexed"

  it should "equal the in-memory scorer through the persisted models" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = freshDir("dsir_index")
    LangModel.writeLmModel(docs, col("text"), s"$base/raw")
    LangModel.writeLmModel(docs.filter(col("lang") === "en"), col("text"),
      s"$base/tgt")
    val indexed = Dsir.importanceWeightsIndexed(docs, col("text"),
        col("doc_id"), col("lang") === "en", s"$base/raw", s"$base/tgt")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val direct = Dsir.importanceWeights(docs, col("text"), col("doc_id"),
        col("lang") === "en")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    indexed shouldBe direct
  }

  behavior of "Dsir.resampleGumbel"

  it should "be deterministic per seed and differ across seeds" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def ids(seed: Long) = Dsir.resampleGumbel(docs, col("text"),
        col("doc_id"), col("lang") === "en", k = 20,
        temperature = 1.0, seed = seed)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    ids(7L) shouldBe ids(7L)
    ids(7L) should not be ids(8L)
    ids(7L) should have size 20
  }

  it should "collapse to the deterministic top-k as temperature goes to 0" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val top = Dsir.resampleTop(docs, col("text"), col("doc_id"),
        col("lang") === "en", k = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // at T = 1e-9 the weight term dominates any Gumbel draw
    val cold = Dsir.resampleGumbel(docs, col("text"), col("doc_id"),
        col("lang") === "en", k = 20, temperature = 1e-9, seed = 3L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    cold shouldBe top
  }
}
