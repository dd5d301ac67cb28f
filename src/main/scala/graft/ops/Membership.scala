package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership — the approximate "have we seen this key"
  * primitive of incremental corpus curation (URL / doc-id dedup across
  * crawl epochs, eval-set guards) when an exact key join is too heavy:
  * a fixed `m`-bit array answers membership with zero false negatives
  * and a bounded false-positive rate (Bloom 1970).
  *
  * Built entirely from codegen'd builtins — no UDF, no custom
  * Expression: the `k` bit positions of a key are independent
  * `xxhash64(key, i)` draws reduced mod `m`, and the filter is the
  * per-64-bit-word `bit_or` of one-hot masks — an abelian aggregate,
  * so the bit array is BIT-IDENTICAL under any partitioning, merge
  * order, or AQE re-plan (same argument as the count-min sketch in
  * [[graft.functions.CountMinAggregator]]).
  *
  * `m` must be a multiple of 64; since the word index is
  * `pos >> 6` and the bit index is `pos & 63`, the mod-`m` and mod-64
  * reductions then commute and each position is computed with two
  * shifts — no 128-bit arithmetic, nothing that can overflow under
  * ANSI mode.
  *
  * Scale shapes at 100 TB:
  *  - BUILD: one partial-aggregated shuffle of (word, mask) rows —
  *    ≤ m/64 rows after map-side combine, independent of key count.
  *  - PROBE (broadcast): for filters that fit an executor (m ≤ a few
  *    hundred MiB), the bit array rides the plan as an array literal
  *    and the probe is a pure projection — zero shuffle.
  *  - PROBE (join): for filters too big to broadcast, keep the filter
  *    AS a (word, bits) table: each probe explodes to its k words,
  *    joins on the 8-byte word id, and folds `bool_and` back per key —
  *    k·probes skinny rows on the wire, never the payloads. Sharding
  *    the key space into independent filters composes with this by
  *    prefixing the word with a shard id.
  */
object Membership {

  private def keyStr(c: Column): Column = c.cast("string")

  /** Position source: one 64-bit-ish draw per (key, family). Pluggable
    * so an oracle can choose a hash BOTH engines implement; every
    * kernel below is hash-agnostic — word/mask packing, bit_or merge,
    * and probe semantics are identical under any draw. */
  type Hasher = (Column, Column) => Column

  /** Production draw: independent `xxhash64(key, i)` — codegen'd,
    * 8 bytes/row of hash work. NOT reproducible outside Spark without
    * reimplementing XXH64's wrapping 64-bit arithmetic (DuckDB's
    * integer ops error on overflow rather than wrap), which is why the
    * xxhash64-backed gates are invariant-checked, not value-replayed. */
  val xxHash: Hasher = (key, i) => xxhash64(keyStr(key), i)

  /** Oracle draw: 5 hex chars of md5(key) per family (k ≤ 6) — ~20-bit
    * positions, slower than xxhash64, but md5 hex is bit-identical in
    * Spark and DuckDB, so a SQL oracle can replay the filter exactly
    * (q_bloom_exact). Not the production default.
    *
    * Hard limits enforced by every kernel ([[md5Limits]]): positions
    * are drawn from 5 hex chars ⇒ max 2²⁰−1, so any mBits > 2²⁰ would
    * silently leave the upper filter bits unreachable (effective m
    * saturates, absent-side FP rate grows with n); and k > 6 would
    * substr past the 32 md5 hex chars into nulls. Callers that need a
    * bigger replayable filter must shard the key space into ≤ 2²⁰-bit
    * filters (word-prefix sharding, see scale notes above). */
  val md5Hash: Hasher = (key, i) =>
    conv(md5(keyStr(key)).substr(i * lit(5) + lit(1), lit(5)), 16, 10)
      .cast("long")

  /** md5Hash draws only 20-bit positions from 6 disjoint hex windows;
    * reject configurations those draws cannot reach. */
  private def md5Limits(hasher: Hasher, mBits: Long, k: Int): Unit =
    if (hasher eq md5Hash) {
      require(mBits <= (1L << 20),
        s"md5Hash positions are 20-bit: mBits=$mBits > 2^20 would leave " +
          "upper filter bits permanently unreachable (shard the filter instead)")
      require(k <= 6, s"md5Hash supports k<=6 5-hex-char windows, got k=$k")
    }

  /** Bit positions are drawn per hash family `i` as
    * `pmod(hash(key, i), m)`; with 64 | m the in-word bit is just
    * `pmod(h, 64)`. */
  private def posOf(key: Column, i: Int, mBits: Long, hasher: Hasher): Column =
    pmod(hasher(key, lit(i)), lit(mBits))

  private def maskOf(key: Column, i: Int, hasher: Hasher): Column =
    call_function("shiftleft", lit(1L),
      pmod(hasher(key, lit(i)), lit(64L)).cast("int"))

  private def require64(mBits: Long): Unit =
    require(mBits >= 64 && mBits % 64 == 0, s"mBits=$mBits not a multiple of 64")

  /** Build the filter over `keys(keyCol)` as a (word: long, bits: long)
    * frame — sparse (absent words are all-zero) and at most m/64 rows. */
  def bloomBits(keys: DataFrame, keyCol: String, mBits: Long, k: Int,
      hasher: Hasher = xxHash): DataFrame = {
    require64(mBits)
    require(k >= 1 && k <= 16, s"k=$k out of range")
    md5Limits(hasher, mBits, k)
    val h = hasher(col("__bl_key"), col("__bl_i"))
    keys
      .select(col(keyCol).as("__bl_key"))
      .select(col("__bl_key"), explode(sequence(lit(0), lit(k - 1))).as("__bl_i"))
      .select(
        shiftright(pmod(h, lit(mBits)), 6).as("word"),
        call_function("shiftleft", lit(1L),
          pmod(h, lit(64L)).cast("int")).as("mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Collect a (word, bits) frame into the dense little-endian word
    * array — driver-side, m/64 longs (metadata-sized for broadcastable
    * filters; use [[probeJoin]] beyond that). */
  def collectBits(bitsDf: DataFrame, mBits: Long): Array[Long] = {
    require64(mBits)
    val dense = new Array[Long]((mBits / 64).toInt)
    bitsDf.select(col("word"), col("bits")).collect().foreach { r =>
      dense(r.getLong(0).toInt) = r.getLong(1)
    }
    dense
  }

  /** Zero-shuffle probe: the filter rides the plan as a literal and
    * `bloom_hit` is a codegen'd projection over `probes`. */
  def probeBroadcast(
      probes: DataFrame, keyCol: String, bits: Array[Long],
      mBits: Long, k: Int, hasher: Hasher = xxHash): DataFrame = {
    require64(mBits)
    require(bits.length.toLong == mBits / 64, s"bits.length=${bits.length}")
    md5Limits(hasher, mBits, k)
    val bitsLit = lit(bits)
    val hit = (0 until k).map { i =>
      val word = shiftright(posOf(col(keyCol), i, mBits, hasher), 6)
      (element_at(bitsLit, (word + lit(1L)).cast("int"))
        .bitwiseAND(maskOf(col(keyCol), i, hasher)) =!= lit(0L))
    }.reduce(_ && _)
    probes.withColumn("bloom_hit", hit)
  }

  /** Persist the filter as a write-once epoch artifact (the
    * cross-epoch seen-key guard shape: build over epoch N's keys once,
    * probe every epoch-N+1 batch against it): sparse (word, bits)
    * rows under `path/bits` plus a 1-row `path/meta` frame carrying
    * (m_bits, k), so probes need no out-of-band parameters. Same
    * overwrite discipline as the dedup/ANN index writers — the root
    * is deleted first, so a rebuild can never leave stale epochs. */
  def writeBloom(
      bitsDf: DataFrame, mBits: Long, k: Int, path: String): Unit = {
    require64(mBits)
    val spark = bitsDf.sparkSession
    graft.io.Fs.deleteRecursive(spark, path)
    bitsDf.select(col("word"), col("bits"))
      .write.mode("overwrite").parquet(s"$path/bits")
    import spark.implicits._
    Seq((mBits, k)).toDF("m_bits", "k").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Probe a persisted filter. Filters at or under
    * `broadcastMaxBits` (default 2^28 bits = 32 MiB dense) collect to
    * the dense array and take the zero-shuffle broadcast kernel;
    * larger filters stay distributed and take the join kernel — the
    * same two shapes as the in-memory API, chosen from the persisted
    * meta. */
  def probeBloom(
      probes: DataFrame, keyCol: String, path: String,
      broadcastMaxBits: Long = 1L << 28): DataFrame = {
    val spark = probes.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val mBits = meta.getLong(0)
    val k = meta.getInt(1)
    val bitsDf = spark.read.parquet(s"$path/bits")
    if (mBits <= broadcastMaxBits)
      probeBroadcast(probes, keyCol, collectBits(bitsDf, mBits), mBits, k)
    else
      probes.join(probeJoin(probes, keyCol, bitsDf, mBits, k),
        Seq(keyCol), "left")
  }

  /** Union two filters built with the SAME (m, k): per-word `bit_or`
    * of the sparse frames. Because the filter is an abelian bit_or
    * aggregate, `merge(bloomBits(A), bloomBits(B))` is BIT-IDENTICAL
    * to `bloomBits(A ∪ B)` — epochs can be built independently and
    * folded without touching the keys again. */
  def mergeBits(bitsA: DataFrame, bitsB: DataFrame): DataFrame =
    bitsA.unionByName(bitsB)
      .groupBy(col("word"))
      .agg(expr("bit_or(bits)").as("bits"))

  /** Join probe for filters kept distributed: returns the distinct
    * (keyCol, bloom_hit) verdict frame; callers join it back. */
  def probeJoin(
      probes: DataFrame, keyCol: String, bitsDf: DataFrame,
      mBits: Long, k: Int, hasher: Hasher = xxHash): DataFrame = {
    require64(mBits)
    md5Limits(hasher, mBits, k)
    val h = hasher(col("__bl_key"), col("__bl_i"))
    val lookups = probes
      .select(col(keyCol).as("__bl_key")).distinct()
      .select(col("__bl_key"), explode(sequence(lit(0), lit(k - 1))).as("__bl_i"))
      .select(col("__bl_key"),
        shiftright(pmod(h, lit(mBits)), 6).as("word"),
        call_function("shiftleft", lit(1L),
          pmod(h, lit(64L)).cast("int")).as("mask"))
    lookups
      .join(bitsDf, Seq("word"), "left")
      .select(col("__bl_key"),
        (col("bits").isNotNull &&
          col("bits").bitwiseAND(col("mask")) =!= lit(0L)).as("__bl_hit"))
      .groupBy(col("__bl_key"))
      .agg(expr("bool_and(__bl_hit)").as("bloom_hit"))
      .withColumnRenamed("__bl_key", keyCol)
  }
}
