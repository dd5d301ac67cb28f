package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvolveSpec extends SparkSpec {

  "Evolve.readMerged" should "unify epochs with added AND removed columns onto the defaults" in {
    import spark.implicits._
    val root = tmpDir("evolve") + "/layout"
    graft.io.Fs.deleteRecursive(spark, root)
    // epoch 0: (id, a) — predates column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(s"$root/epoch=0")
    // epoch 1: (id, a, b) — column b added
    Seq((3L, "z", 7L)).toDF("id", "a", "b")
      .write.parquet(s"$root/epoch=1")
    // epoch 2: (id, b) — column a REMOVED again
    Seq((4L, 9L)).toDF("id", "b")
      .write.parquet(s"$root/epoch=2")
    val out = Evolve.readMerged(spark, root,
        Map("a" -> "unknown", "b" -> -1L))
      .select(col("epoch").cast("int"), col("id"), col("a"), col("b"))
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._2)
    out.toSeq shouldBe Seq(
      (0, 1L, "x", -1L), // backfilled b
      (0, 2L, "y", -1L),
      (1, 3L, "z", 7L),  // native b
      (2, 4L, "unknown", 9L)) // backfilled a
    // no nulls survive the backfill anywhere
    Evolve.readMerged(spark, root, Map("a" -> "unknown", "b" -> -1L))
      .filter(col("a").isNull || col("b").isNull).count() shouldBe 0L
  }

  it should "leave fully-present columns untouched and add absent defaults as literals" in {
    import spark.implicits._
    val root = tmpDir("evolve") + "/layout2"
    graft.io.Fs.deleteRecursive(spark, root)
    Seq((1L, "k")).toDF("id", "a").write.parquet(s"$root/epoch=0")
    val out = Evolve.readMerged(spark, root,
        Map("a" -> "unknown", "c" -> 0L))
      .select(col("id"), col("a"), col("c")).collect()
    out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, "k", 0L))
  }
}
