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

  /** Join types for which salting is result-equivalent to the plain
    * join: the BIG side keeps every row exactly once per salt, so
    * inner/left/semi/anti hold; right/full outer would null-extend
    * exploded small rows whose salt bucket drew no big rows. */
  private def requireSaltableJoinType(joinType: String): Unit = {
    val t = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(t),
      s"joinType=$joinType is not salt-equivalent to the plain join " +
        "(right/full outer would null-extend empty salt buckets); " +
        "use inner/left/left_semi/left_anti")
  }

  /** Equi-join `big ⋈ small` on `key`, salted `saltBuckets` ways. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    requireSaltableJoinType(joinType)
    // deterministic per-row salt on the big side: hash of the whole row
    val bigCols = big.columns.map(col).toSeq
    val salted = big.withColumn(
      "__salt", pmod(xxhash64(bigCols: _*), lit(saltBuckets)).cast("int"))
    val exploded = small.withColumn(
      "__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** ADAPTIVE salted join: detect the hot keys first, salt only those.
    *
    * [[saltedJoin]] explodes the ENTIRE small side ×`saltBuckets` —
    * correct, but it multiplies the small side's shuffle/build size by
    * the bucket count even though skew lives in a handful of keys. This
    * variant spends one partial-aggregated pass over the big side
    * (map-side combine: the shuffle carries (key, count) partials, not
    * rows) to find keys with ≥ `hotThreshold` rows, then:
    *
    *   - big rows on a hot key get a deterministic row-hash salt,
    *     cold rows salt 0;
    *   - small rows are exploded ×`saltBuckets` ONLY for hot keys,
    *     cold rows pass through once with salt 0.
    *
    * The hot-key frame is broadcast-tagged onto both sides. The hint is
    * not a scale ceiling: by construction |hot| ≤ |big| / hotThreshold
    * (a key needs that many rows to qualify), so the frame is bounded
    * small for any sane threshold — the exact opposite of broadcasting
    * a data-sized frame. Join output ≡ the plain join's (its oracle IS
    * the plain join); only the physical distribution changes — the same
    * contract as [[saltedJoin]], at a small-side cost of
    * |small| + |hot|·saltBuckets instead of |small|·saltBuckets. */
  def adaptiveSaltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, hotThreshold: Long,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets=$saltBuckets must be >= 2")
    require(hotThreshold >= 1, s"hotThreshold=$hotThreshold must be >= 1")
    // right/full outer are NOT salt-equivalent: a hot key whose big
    // rows happen to miss one salt bucket would null-extend that
    // bucket's exploded small row — a row the plain join never emits
    requireSaltableJoinType(joinType)
    val hotKeys = broadcast(
      hotKeyCensus(big, key, hotThreshold)
        .select(col(key), lit(true).as("__hot")))
    val bigCols = big.columns.map(col).toSeq
    val bigTagged = big.join(hotKeys, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"),
          pmod(xxhash64(bigCols: _*), lit(saltBuckets)).cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val smallTagged = small.join(hotKeys, Seq(key), "left")
      .withColumn("__salts",
        when(col("__hot"), sequence(lit(0), lit(saltBuckets - 1)))
          .otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__salts", "__hot")
    bigTagged.join(smallTagged, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Hot-key census for the adaptive join, exposed for tests and for
    * pipelines that want to LOG what was salted (a silent skew fix is
    * an undiagnosable one): (key, n) for keys at or above the
    * threshold. */
  def hotKeyCensus(df: DataFrame, key: String, hotThreshold: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= hotThreshold)

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
