package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The histogram-quantile contract: the integer two-pass estimate sits
  * within its own published `err_bound` of the TRUE sorted quantile,
  * on real data and on crafted edges (constant group, tiny group,
  * skewed mass), and is bit-stable under repartitioning. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def exactQ(sorted: Vector[Long], num: Int, den: Int): Long = {
    val rank = ((sorted.size.toLong * num + den - 1) / den).toInt
    sorted(math.max(rank - 1, 0))
  }

  behavior of "Quantiles.histogramQuantiles"

  it should "bound the true quantile within err_bound on lineitem" in {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long").as("v"))
    val res = Quantiles.histogramQuantiles(li, col("v"), col("g"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val byG = li.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted.toVector }
    byG.keySet shouldBe res.keySet
    for ((g, sorted) <- byG; (name, num, den) <-
           Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))) {
      val row = res(g)
      val est = row.getAs[Long](s"${name}_est")
      val bound = row.getAs[Long]("err_bound")
      val truth = exactQ(sorted, num, den)
      withClue(s"$g $name: est=$est truth=$truth bound=$bound ") {
        math.abs(est - truth) should be <= bound
      }
      row.getAs[Long]("n") shouldBe sorted.size.toLong
      row.getAs[Long]("vmin") shouldBe sorted.head
      row.getAs[Long]("vmax") shouldBe sorted.last
    }
  }

  it should "handle constant and tiny groups exactly" in {
    val df = Seq(
      ("const", 42L), ("const", 42L), ("const", 42L),
      ("one", 7L),
      ("two", 1L), ("two", 1000000L)).toDF("g", "v")
    val res = Quantiles.histogramQuantiles(df, col("v"), col("g"))
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // constant group: range 1, every estimate IS the value, bound 1+1
    res("const").getAs[Long]("p50_est") shouldBe 42L
    res("const").getAs[Long]("p99_est") shouldBe 42L
    res("one").getAs[Long]("p50_est") shouldBe 7L
    // two extreme values: p50 rank 1 → low bucket, p99 rank 2 → high
    val two = res("two")
    math.abs(two.getAs[Long]("p50_est") - 1L) should be <=
      two.getAs[Long]("err_bound")
    math.abs(two.getAs[Long]("p99_est") - 1000000L) should be <=
      two.getAs[Long]("err_bound")
  }

  it should "find the EXACT median by refinement, no sort" in {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long").as("v"))
    val res = Quantiles.exactQuantileByRefinement(
      li, col("v"), col("g"), num = 1, den = 2)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("quantile"))
      .toMap
    val truth = li.as[(String, Long)].collect().groupBy(_._1)
      .map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> exactQ(sorted.toVector, 1, 2)
      }
    truth.foreach { case (g, m) =>
      withClue(s"group $g: ") { res(g) shouldBe m }
    }
    // degenerate shapes: constant group, tiny group, two-point group
    val tiny = Seq(("c", 5L), ("c", 5L), ("t", 9L),
      ("two", 1L), ("two", 100L)).toDF("g", "v")
    val r2 = Quantiles.exactQuantileByRefinement(
      tiny, col("v"), col("g"), 1, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    r2 shouldBe Map("c" -> 5L, "t" -> 9L, "two" -> 1L)
  }

  it should "be bit-stable under repartitioning and ignore nulls" in {
    val base = (1L to 5000L).map(i => ("g", i * i % 9973)) ++
      Seq.fill(10)(("g", -1L))
    val df = base.toDF("g", "v")
      .withColumn("v", when(col("v") === -1L, lit(null).cast("long"))
        .otherwise(col("v")))
    val a = Quantiles.histogramQuantiles(df, col("v"), col("g"))
      .collect().map(_.toSeq).toSeq
    val b = Quantiles.histogramQuantiles(
      df.repartition(13, col("v")), col("v"), col("g"))
      .collect().map(_.toSeq).toSeq
    a shouldBe b
    a.head(1) shouldBe 5000L // nulls excluded from n
  }
}
