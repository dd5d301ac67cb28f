package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  // one pathologically hot key (1000 rows) among uniform cold keys
  private lazy val big = {
    import spark.implicits._
    val hot = (0 until 1000).map(i => (7L, i.toLong))
    val cold = (0 until 200).map(i => ((i % 20 + 100).toLong, i.toLong))
    (hot ++ cold).toDF("k", "v")
  }
  private lazy val small = {
    import spark.implicits._
    ((0 until 20).map(i => ((i + 100).toLong, s"cold_$i")) :+ (7L, "hot"))
      .toDF("k", "name")
  }

  private def plain = big.join(small, "k")

  "adaptiveSaltedJoin" should "equal the plain join exactly" in {
    val adaptive = SkewJoin.adaptiveSaltedJoin(
      big, small, "k", saltBuckets = 8, hotThreshold = 100)
    adaptive.columns.toSeq shouldBe plain.columns.toSeq
    adaptive.collect().map(_.toSeq).toSet shouldBe plain.collect().map(_.toSeq).toSet
    adaptive.count() shouldBe plain.count()
  }

  it should "salt only the detected hot keys" in {
    val hot = SkewJoin.hotKeyCensus(big, "k", 100).collect()
    hot.map(_.getLong(0)).toSeq shouldBe Seq(7L)
    hot.head.getLong(1) shouldBe 1000L
    // cold keys at threshold 100: the small side passes through once
    // per cold key, so the exploded small row count is
    // |small| + |hot|·(buckets−1)
    val smallExploded = {
      val hotKeys = broadcast(
        big.groupBy(col("k")).agg(count(lit(1)).as("__hn"))
          .filter(col("__hn") >= 100)
          .select(col("k"), lit(true).as("__hot")))
      small.join(hotKeys, Seq("k"), "left")
        .withColumn("__salts",
          when(col("__hot"), sequence(lit(0), lit(7))).otherwise(array(lit(0))))
        .withColumn("__salt", explode(col("__salts")))
    }
    smallExploded.count() shouldBe (small.count() + 7)
  }

  it should "equal the plain join when nothing is hot" in {
    val adaptive = SkewJoin.adaptiveSaltedJoin(
      big, small, "k", saltBuckets = 8, hotThreshold = 100000)
    adaptive.collect().map(_.toSeq).toSet shouldBe plain.collect().map(_.toSeq).toSet
  }

  it should "equal the plain join when everything is hot" in {
    val adaptive = SkewJoin.adaptiveSaltedJoin(
      big, small, "k", saltBuckets = 4, hotThreshold = 1)
    adaptive.collect().map(_.toSeq).toSet shouldBe plain.collect().map(_.toSeq).toSet
  }

  it should "preserve unmatched big rows under a left join" in {
    import spark.implicits._
    val bigExtra = big.union(Seq((999L, 1L)).toDF("k", "v"))
    val adaptive = SkewJoin.adaptiveSaltedJoin(
      bigExtra, small, "k", saltBuckets = 8, hotThreshold = 100, joinType = "left")
    val expected = bigExtra.join(small, Seq("k"), "left")
    adaptive.collect().map(_.toSeq).toSet shouldBe expected.collect().map(_.toSeq).toSet
  }

  it should "reject join types that are not salt-equivalent" in {
    val e = intercept[IllegalArgumentException] {
      SkewJoin.adaptiveSaltedJoin(
        big, small, "k", saltBuckets = 8, hotThreshold = 100, joinType = "full")
    }
    e.getMessage should include("not salt-equivalent")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, "k", saltBuckets = 8, joinType = "right")
    }
  }

  "saltedJoin" should "still equal the plain join (regression)" in {
    val salted = SkewJoin.saltedJoin(big, small, "k", saltBuckets = 8)
    salted.collect().map(_.toSeq).toSet shouldBe plain.collect().map(_.toSeq).toSet
  }
}
