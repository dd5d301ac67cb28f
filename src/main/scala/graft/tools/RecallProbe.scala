package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.tools.Ckpt._

/** Scratch: measured sampled-vs-full ANN recall per SF (floors for
  * q_ann_recall / q_ann_recall_sampled and the per-method gate rows of
  * q_ann_ivf / q_ann_lsh / q_ann_lsh_topk are set from these
  * deterministic values), plus the structural facts those gates assert
  * (top-1 coverage, top-k row shape). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val isQ = substring(md5(col("vec_id").cast("string")), 1, 1) < lit("4")
    def recall(t: DataFrame, ann: DataFrame): (Long, Double) = {
      val j = t.join(ann.select(col("qid"), col("cid"), col("cos")), Seq("qid"), "left")
      val n = j.count()
      val f = j.filter(col("cid") === col("tcid") || col("cos") === col("tcos")).count()
      (n, f.toDouble / n)
    }
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val nVec = e.count()
      val truth = Similarity.bruteForceTop1Sampled(e, isQ)
        .select(col("qid"), col("cid").as("tcid"), col("cos").as("tcos"))
        .checkpointLinted()
      val truthAll = Similarity.bruteForceTop1All(e)
        .select(col("qid"), col("cid").as("tcid"), col("cos").as("tcos"))
        .checkpointLinted()
      val lshTop1 = Similarity.lshAnnTop1(e, planes = 4, tables = 8).checkpointLinted()
      val ivfTop1 = Similarity.ivfAnnTop1(e, k = 16, nprobe = 4, lloydIters = 3).checkpointLinted()
      val ivfSq8 = Similarity.ivfSq8AnnTop1(e).checkpointLinted()
      val ivfPq = Similarity.ivfPqAnnTop1(e).checkpointLinted()
      val (nl, lsh) = recall(truth, lshTop1)
      val (_, ivf) = recall(truth, ivfTop1)
      val (_, sq8) = recall(truth, Similarity.int8AnnTop1Sampled(e, isQ))
      val (_, pq) = recall(truth, Similarity.pqAnnTop1Sampled(e, isQ))
      val (_, isq8) = recall(truth, ivfSq8)
      val (_, ipq) = recall(truth, ivfPq)
      val (_, isq8F) = recall(truthAll, ivfSq8)
      val (_, ipqF) = recall(truthAll, ivfPq)
      println(f"$sf: n_vec=$nVec n_sampled=$nl lsh=$lsh%.4f ivf=$ivf%.4f " +
        f"int8=$sq8%.4f pq=$pq%.4f ivf_sq8=$isq8%.4f ivf_pq=$ipq%.4f " +
        f"ivf_sq8_full=$isq8F%.4f ivf_pq_full=$ipqF%.4f")

      // structural facts the per-method gate rows assert
      val topk = Similarity.lshAnnTopK(e, k = 3, planes = 4, tables = 8).checkpointLinted()
      val perQ = topk.groupBy(col("qid"))
        .agg(count(lit(1)).as("n"), max(col("rnk")).as("maxr"),
          countDistinct(col("cid")).as("nd"))
      val badShape = perQ.filter(col("n") =!= 3 || col("maxr") =!= 3 || col("nd") =!= 3).count()
      // recall@3: the true top-1 appears anywhere in the top-3
      val hit3 = truth.join(topk, Seq("qid"), "left")
        .filter(col("cid") === col("tcid") || col("cos") === col("tcos"))
        .select(col("qid")).distinct().count()
      println(f"$sf: lsh_cov=${lshTop1.count()} ivf_cov=${ivfTop1.count()} " +
        f"topk_rows=${topk.count()} topk_badshape=$badShape " +
        f"recall_at3=${hit3.toDouble / nl}%.4f")

      // persisted-index gate facts: all-lists-probed top-4, self-twin
      // excluded (q_ann_index's exact shape)
      val idxBase = s"target/tmp-recall-probe-$sf"
      def rmrf(p: java.io.File): Unit = {
        if (p.isDirectory) { val fs = p.listFiles(); if (fs != null) fs.foreach(rmrf) }
        p.delete(); ()
      }
      rmrf(new java.io.File(idxBase))
      Similarity.writeAnnIndex(e, idxBase, k = 16, lloydIters = 3)
      val shift = 1000000000L
      val qs = e.filter(isQ)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
      val idxTopk = Similarity.annIndexTopK(idxBase, qs, topK = 4, nprobe = 16)
        .select((col("qid") - shift).as("qid"), col("cid"), col("cos"))
        .filter(col("cid") =!= col("qid"))
        .checkpointLinted()
      val idxHit = truth.join(idxTopk, Seq("qid"), "left")
        .filter(col("cid") === col("tcid") || col("cos") === col("tcos"))
        .select(col("qid")).distinct().count()
      val perQIdx = idxTopk.groupBy(col("qid"))
        .agg(count(lit(1)).as("n"), countDistinct(col("cid")).as("nd"))
      val badIdx = perQIdx.filter(col("n") < 3 || col("nd") < 3).count()
      println(f"$sf: idx_recall_at3=${idxHit.toDouble / nl}%.4f " +
        f"idx_cov=${perQIdx.count()} idx_badshape=$badIdx")
    }

    // recall of the DEPLOYMENT-SIZED configurations at rehearsal scale
    // (docs/SCALE.md): scaling k/planes keeps candidate work bounded —
    // this measures what it costs in recall and how the compensating
    // knobs (nprobe, tables) buy it back. Requires target/sf1
    // (graft.tools.ScaleRehearsal generates it).
    val sf1 = "target/sf1"
    if (new java.io.File(s"$sf1/embeddings.parquet").exists()) {
      val e = spark.read.parquet(s"$sf1/embeddings.parquet")
      val n = e.count()
      val truth = Similarity.bruteForceTop1Sampled(e, isQ)
        .select(col("qid"), col("cid").as("tcid"), col("cos").as("tcos"))
        .checkpointLinted()
      val k = Similarity.ivfListsFor(n)
      val planes = Similarity.lshPlanesFor(n)
      val (nq, ivfFixed) = recall(truth, Similarity.ivfAnnTop1(e, k = 16, nprobe = 4))
      val (_, ivfS4) = recall(truth, Similarity.ivfAnnTop1(e, k = k, nprobe = 4))
      val (_, ivfS16) = recall(truth, Similarity.ivfAnnTop1(e, k = k, nprobe = 16))
      val (_, lshFixed) = recall(truth, Similarity.lshAnnTop1(e, planes = 4, tables = 8))
      val (_, lshS8) = recall(truth, Similarity.lshAnnTop1(e, planes = planes, tables = 8))
      val (_, lshS16) = recall(truth, Similarity.lshAnnTop1(e, planes = planes, tables = 16))
      println(f"sf1: n_vec=$n n_sampled=$nq k=$k planes=$planes " +
        f"ivf_fixed=$ivfFixed%.4f ivf_scaled_np4=$ivfS4%.4f ivf_scaled_np16=$ivfS16%.4f " +
        f"lsh_fixed=$lshFixed%.4f lsh_scaled_t8=$lshS8%.4f lsh_scaled_t16=$lshS16%.4f")
    }
    spark.stop()
  }
}
