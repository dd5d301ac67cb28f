package graft.functions

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Count-min sketch: the one-sided guarantee and ε-bound on a
  * high-cardinality skewed stream, exact sketch determinism under
  * repartitioning (the abelian-merge property), and agreement with
  * exact counts on real documents. */
class CountMinSpec extends SparkSpec {

  private val width = 512
  private val depth = 4

  private def skewed = {
    val hot = (0 until 8).flatMap(i => Seq.fill(2000 / (i + 1))(s"hot_$i"))
    val tail = (0 until 3000).map(i => s"tail_$i")
    hot ++ tail
  }

  private def sketchOf(items: Seq[String], parts: Int): Array[Long] = {
    import spark.implicits._
    items.toDF("t").repartition(parts)
      .agg(CountMin.sketch(width, depth)(col("t")).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
  }

  "CountMinAggregator" should "never under-count and respect the ε-bound on hot items" in {
    val items = skewed
    val n = items.size
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = sketchOf(items, parts = 4)
    exact.foreach { case (t, c) =>
      val est = CountMin.estimate(sk, t, width, depth)
      withClue(s"$t: ") { est should be >= c }
    }
    // the ε-bound on every hot item (vocabulary 3008 ≫ width 512, so
    // collisions genuinely occur in the tail)
    exact.filter(_._2 > 100).foreach { case (t, c) =>
      val est = CountMin.estimate(sk, t, width, depth)
      (est - c).toDouble should be <= math.E * n / width
    }
  }

  it should "produce the bit-identical sketch under every partitioning" in {
    val items = skewed
    val ref = sketchOf(items, parts = 1)
    for (parts <- Seq(3, 17)) {
      sketchOf(items, parts).toSeq shouldBe ref.toSeq
    }
  }

  it should "fold a weighted census to the bit-identical sketch of the raw stream" in {
    // counter adds are abelian: sketch(census with counts) must equal
    // sketch(token stream) exactly — this is what lets q_text_countmin
    // build from the vocabulary-sized census in ONE tokenize pass
    import spark.implicits._
    val items = skewed
    val ref = sketchOf(items, parts = 4)
    val census = items.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    for (parts <- Seq(1, 5)) {
      val viaCensus = census.toDF("t", "c").repartition(parts)
        .agg(CountMin.sketchWeighted(width, depth)(col("t"), col("c")).as("sk"))
        .collect()(0).getSeq[Long](0).toArray
      viaCensus.toSeq shouldBe ref.toSeq
    }
  }

  it should "estimate real document token counts within the bound" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(Text.tokens(col("text"))).as("term"))
    val sk = toks.agg(CountMin.sketch(width, depth)(col("term")).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (t, c) =>
      val est = CountMin.estimate(sk, t, width, depth)
      est should be >= c
      (est - c).toDouble should be <= math.E * n / width
    }
  }
}
