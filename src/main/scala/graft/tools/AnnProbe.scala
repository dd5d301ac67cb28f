package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Similarity

/** Scratch: stage-level timing of the ANN paths at sf0.1. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println(s"n = ${e.count()}")
    time("typed-warmup") {
      val tiny = spark.range(64).map(i => (i % 4L, Array.fill(8)(i.toDouble)))
      tiny.groupByKey(_._1)
        .flatMapGroups((k: Long, it: Iterator[(Long, Array[Double])]) =>
          Iterator.single((k, it.map(_._2(0)).sum)))
        .toDF("k", "s").count()
    }
    time("lsh-first") { Similarity.lshAnnTop1(e).count() }
    time("ivf-seeded") { Similarity.ivfAnnTop1(e, lloydIters = 0).count() }
    time("ivf-trained-3") { Similarity.ivfAnnTop1(e, lloydIters = 3).count() }
    time("ivf-trained-again") { Similarity.ivfAnnTop1(e, lloydIters = 3).count() }
    spark.stop()
  }
}
