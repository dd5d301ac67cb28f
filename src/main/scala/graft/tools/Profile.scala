package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scratch stage-level profiler for the minhash pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shingled = time("shingles+cache") {
      val sh = Dedup.docShingles(docs, "text", "doc_id").cache()
      sh.count(); sh
    }
    val sigs = time("signatures") {
      val g = Dedup.minhashSignatures(shingled); g.count(); g
    }
    val cands = time("lsh-candidates") {
      val c = Dedup.lshCandidatePairs(Dedup.minhashSignatures(shingled)); c.count(); c
    }
    time("verify") {
      Dedup.verifyJaccard(cands, shingled).filter(col("jaccard") >= 0.8).count()
    }
    val tokenHashes = time("simhash-tokens") {
      val th = docs.select(col("doc_id"), explode(graft.ops.Text.tokens(col("text"))).as("tok"))
        .withColumn("th", xxhash64(col("tok")))
      th.count(); th
    }
    time("simhash-full") {
      Dedup.simhash(docs, "text", "doc_id").count()
    }
    time("simhash-full-again") {
      Dedup.simhash(docs, "text", "doc_id").count()
    }
    // replicate Bench's sequence through SparkEntry
    time("seq-minhash") { graft.SparkEntry.queries("q_dedup_minhash")(spark, sfDir).count() }
    time("seq-ngram") { graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir).count() }
    time("seq-simhash") { graft.SparkEntry.queries("q_dedup_simhash")(spark, sfDir).count() }
    spark.stop()
  }
}
