package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §4 scale lever; no reference
  * equivalent — the reference is single-process).
  *
  * A shuffle join on a skewed key funnels the hot key's rows into one
  * task. Salting splits each hot key into `saltBuckets` sub-keys: the
  * big (skewed) side gets a RANDOM-ish salt derived from a stable row
  * hash (deterministic — no rand(), so plans are replayable), the small
  * side is EXPLODED ×saltBuckets so every sub-key finds its match. Join
  * result is exactly the plain join's (verified by its oracle, which
  * IS the plain join) — only the physical distribution changes:
  * hot-key work spreads across `saltBuckets` tasks.
  *
  * AQE's skew-join split handles moderate skew automatically; explicit
  * salting remains the tool when one key dominates an entire stage or
  * the skew is in an aggregation upstream of AQE's reach. */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, salted `saltBuckets` ways. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // deterministic per-row salt on the big side: hash of the whole row
    val bigCols = big.columns.map(col).toSeq
    val salted = big.withColumn(
      "__salt", pmod(xxhash64(bigCols: _*), lit(saltBuckets)).cast("int"))
    val exploded = small.withColumn(
      "__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group-by keys:
    * pre-aggregate on (key, salt), then merge per key. Spark's hash
    * aggregate already does map-side partials; this adds a REDUCE-side
    * split for keys whose partial stream still overwhelms one task. */
  def saltedCountSum(
      df: DataFrame, key: String, sumCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }
}
