package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch: measured sampled-vs-full ANN recall per SF (floors for
  * q_ann_recall_sampled are set from these deterministic values). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val isQ = substring(md5(col("vec_id").cast("string")), 1, 1) < lit("4")
      val truth = Similarity.bruteForceTop1Sampled(e, isQ)
        .select(col("qid"), col("cid").as("tcid"), col("cos").as("tcos"))
        .localCheckpoint(true)
      def recall(ann: org.apache.spark.sql.DataFrame): (Long, Double) = {
        val j = truth.join(ann.select(col("qid"), col("cid"), col("cos")), Seq("qid"), "left")
        val n = j.count()
        val f = j.filter(col("cid") === col("tcid") || col("cos") === col("tcos")).count()
        (n, f.toDouble / n)
      }
      val (nl, lsh) = recall(Similarity.lshAnnTop1(e, planes = 4, tables = 8))
      val (_, ivf) = recall(Similarity.ivfAnnTop1(e, k = 16, nprobe = 4, lloydIters = 3))
      val (_, sq8) = recall(Similarity.int8AnnTop1All(e))
      val (_, pq) = recall(Similarity.pqAnnTop1Sampled(e, isQ))
      println(f"$sf: n_sampled=$nl lsh=$lsh%.4f ivf=$ivf%.4f int8=$sq8%.4f pq=$pq%.4f")
    }
    spark.stop()
  }
}
