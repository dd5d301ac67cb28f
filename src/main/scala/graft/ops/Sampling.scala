package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Deterministic sampling operators for training-data curation.
  *
  * The content-hash split family (`q_sample_hash`,
  * `q_sample_stratified` in [[graft.queries.TextQueries]]) covers
  * fixed-fraction membership; this object covers the DATA-MIXTURE
  * step: re-weighting strata (language, source domain, quality
  * bucket) to target proportions before training — the "domain
  * mixing" knob of every pretraining recipe (public literature:
  * the Pile / GPT-3 mixture tables).
  */
object Sampling {

  /** Hex-string granularity of the keep rule: a doc is kept iff the
    * first 4 hex chars of md5(id) sort below the stratum threshold —
    * so keep fractions are quantized to 1/65536, and membership is a
    * pure function of the id (stable across runs, partitionings,
    * engines, and incremental re-runs, and expressible in ANSI SQL
    * for the oracle — md5 and printf('%04x') agree byte-for-byte in
    * Spark and DuckDB). */
  val Granularity = 65536L

  /** Downsample each stratum toward `targets`: stratum s with weight
    * num/den aims at (num/den) · N total rows, i.e. keep fraction
    * min(1, num·N / (den·count_s)) — computed EXACTLY in integer
    * arithmetic, then quantized to [[Granularity]]. Over-represented
    * strata are thinned; under-represented strata cap at keep-all
    * (this operator never upsamples — repeat-epoch weighting is a
    * training-loader concern). Strata absent from `targets` are
    * dropped (weight 0).
    *
    * Returns the kept rows of `docs` unchanged. Cost at 100 TB: one
    * partial-agg shuffle of (stratum, count) rows — stratum
    * cardinality, not corpus — a broadcast of the threshold map back
    * onto the scan, and a codegen'd filter; the corpus itself never
    * shuffles.
    */
  /** Per-stratum document cap — the "at most n documents per domain"
    * rule of web-corpus curation (public precedent: per-domain caps in
    * the C4/RefinedWeb cleanup recipes). Keeps EXACTLY the top `n`
    * rows of each stratum under (score desc, id asc) and returns the
    * kept key set `(stratumCol, idCol, scoreCol)`; callers re-attach
    * payload columns with a semi-join on the id, so document bodies
    * never ride the aggregation shuffle.
    *
    * Built on [[graft.functions.TopKAggregator]] rather than a
    * `row_number()` window: the window form shuffles every row of a
    * stratum to one task (a hot domain = one straggler), while the
    * aggregate keeps ≤ 4·n pairs per stratum per map task and
    * combines BEFORE the shuffle — a hot stratum's wire cost is
    * tasks × n pairs, not its row count. Scores are integral
    * (cast to long) so ordering is exact — no float tie ambiguity.
    */
  def capPerStratum(
      docs: DataFrame, stratumCol: String, idCol: String,
      scoreCol: String, n: Int): DataFrame = {
    val top = graft.functions.TopK.topBy(n)
    docs
      .groupBy(col(stratumCol))
      .agg(top(col(scoreCol).cast("long"), col(idCol).cast("long"))
        .as("__cap_top"))
      .select(col(stratumCol), explode(col("__cap_top")).as("__cap_row"))
      .select(col(stratumCol),
        col("__cap_row._2").as(idCol),
        col("__cap_row._1").as(scoreCol))
  }

  /** Repeat-factor plan — the UPSAMPLING half of mixture weighting
    * ([[mixtureResample]] deliberately never upsamples; real recipes
    * repeat high-quality sources across an epoch — public precedent:
    * the GPT-3 / Pile mixture tables' epoch counts). Stratum s with
    * target weight num/den over corpus total N aims at
    * target_s = num·N/den rows per epoch: every doc in s gets
    * `n_copies = base_s` (integer division, exact BigInt arithmetic)
    * plus one extra iff its md5 4-hex prefix sorts below the
    * fractional-tail threshold (remainder quantized to
    * [[Granularity]]) — so Σ n_copies tracks target_s within
    * cnt_s/65536 + 1, and WHICH docs carry the extra copy is a pure
    * function of the id (stable across runs, partitionings, engines).
    * Strata absent from `targets` drop (weight 0); docs can carry
    * n_copies = 0 (pure-downsample strata) — loaders filter.
    *
    * Scale shape: identical to [[mixtureResample]] — one
    * stratum-count census, a broadcast of (base, tail) per stratum,
    * and a codegen'd projection; the corpus never shuffles. */
  def epochRepeats(
      docs: DataFrame, stratumCol: String, idCol: String,
      targets: Map[String, (Int, Int)]): DataFrame = {
    require(targets.values.forall { case (num, den) => num >= 0 && den > 0 },
      s"need non-negative weights with positive denominators, got $targets")
    val spark = docs.sparkSession
    val countRows = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("cnt")).collect()
    val total = countRows.map(_.getLong(1)).sum
    val plan = countRows.flatMap { r =>
      val stratum = r.getString(0)
      val cnt = r.getLong(1)
      targets.get(stratum).map { case (num, den) =>
        val tgt = BigInt(num) * total
        val denom = BigInt(den) * cnt
        val base = tgt / denom
        val tail = ((tgt - base * denom) * Granularity) / denom
        (stratum, base.toLong,
          if (tail >= Granularity) "g" else f"${tail.toLong}%04x")
      }
    }
    val tDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        plan.toSeq.map(p => org.apache.spark.sql.Row(p._1, p._2, p._3)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__rep_stratum",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__rep_base",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__rep_tail_below",
          org.apache.spark.sql.types.StringType))))
    docs
      .join(broadcast(tDf), col(stratumCol) === col("__rep_stratum"))
      .withColumn("n_copies",
        col("__rep_base") +
          when(substring(md5(col(idCol).cast("string")), 1, 4) <
            col("__rep_tail_below"), 1L).otherwise(0L))
      .drop("__rep_stratum", "__rep_base", "__rep_tail_below")
  }

  /** Exact-k deterministic uniform sample per stratum — the
    * distributed, rerun-stable replacement for per-group reservoir
    * sampling: rank each row by the integer value of the first 15 hex
    * chars of md5(id) (a 60-bit uniform draw that is a pure function
    * of the id) and keep each stratum's top `n` via the same
    * bounded-heap aggregate as [[capPerStratum]]. Unlike a seeded
    * reservoir, membership is independent of partitioning, task
    * order, and engine — the identical rule is ANSI-expressible
    * (md5-prefix DESC ordering), so the kept set is fully
    * oracle-checkable. Same scale shape as the cap: ≤ 4n pairs per
    * stratum per map task, one pairs-only exchange, the corpus never
    * shuffles. */
  def uniformPerStratum(
      docs: DataFrame, stratumCol: String, idCol: String, n: Int): DataFrame =
    capPerStratum(
      docs.select(col(stratumCol), col(idCol))
        .withColumn("__res_score",
          conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
            .cast("long")),
      stratumCol, idCol, "__res_score", n)
      .drop("__res_score")

  /** TEMPERATURE-flattened mixture (α = 1/2) — the multilingual
    * up/down-sampling rule of the public pretraining literature
    * (XLM's p_s ∝ cnt_s^α rebalancing; mT5/XLM-R use the same family
    * with other α): stratum s gets target share w_s / Σ w_t of the
    * SAME total budget N, with w_s = ⌊√cnt_s⌋ — rare strata are
    * repeated, dominant strata thinned, and the allocation then runs
    * through [[epochRepeats]]' exact integer plan unchanged.
    *
    * α is fixed at 1/2 deliberately: ⌊√n⌋ is the one power both this
    * engine and a SQL oracle compute BIT-IDENTICALLY — IEEE-754 sqrt
    * is correctly rounded, and for integer n < 2^52 the only value
    * where rounding could cross an integer is n = k² (where the
    * result is exact) — so the weights, and therefore every
    * per-document copy count, are engine-independent. A fractional-α
    * variant would put libm `pow` (not correctly rounded) inside the
    * threshold arithmetic and turn 1-ULP drift into ±1 copy-count
    * flips. Scale shape: two stratum-cardinality censuses and the
    * [[epochRepeats]] broadcast projection — the corpus never
    * shuffles. */
  def temperatureRepeats(
      docs: DataFrame, stratumCol: String, idCol: String): DataFrame = {
    val counts = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("cnt")).collect()
    val weights = counts.map(r =>
      r.getString(0) -> math.floor(math.sqrt(r.getLong(1).toDouble)).toLong)
    val den = weights.map(_._2).sum
    require(den > 0 && den <= Int.MaxValue, s"weight sum $den out of range")
    val targets = weights.map { case (st, w) => st -> (w.toInt, den.toInt) }.toMap
    epochRepeats(docs, stratumCol, idCol, targets)
  }

  /** TOKEN-BUDGET selection — "keep the best documents that fit a
    * token budget": rank by (`scoreCol` desc, `idCol` asc) and keep
    * the maximal prefix whose running token sum stays ≤ `budget` (the
    * greedy quality-threshold selection of public data-curation
    * recipes — score-ranked subset selection under a fixed token
    * count). Returns the kept skinny rows plus `cum_tokens`, the
    * GLOBAL running sum including the row itself; callers re-attach
    * payloads by id.
    *
    * The running sum is a DISTRIBUTED two-pass prefix sum, not a
    * single-partition window: an `ORDER BY`-only window would drag
    * the whole corpus through one task. Instead the skinny
    * (id, score, tok) frame is range-partitioned on the sort key,
    * per-partition token totals (one row per partition) are prefix-
    * summed driver-side, and the global cumsum is each partition's
    * broadcast base offset plus a PER-PARTITION running-sum window —
    * every stage parallel, wire cost = skinny columns only. The kept
    * set is partition-invariant because the sort key is a total order
    * (ties broken by id), so range boundaries only decide WHERE the
    * prefix sum is split, never its values. */
  def selectByBudget(
      docs: DataFrame, idCol: String, scoreCol: String, tokCol: String,
      budget: Long): DataFrame = {
    // localCheckpoint pins the range partitioning across the two
    // passes (census + selection) and stops the second pass from
    // re-sorting; skinny columns only, so the checkpoint is id+score+
    // tok sized, never the corpus
    val skinny = docs
      .select(col(idCol), col(scoreCol), col(tokCol))
      .repartitionByRange(col(scoreCol).desc, col(idCol))
      .sortWithinPartitions(col(scoreCol).desc, col(idCol))
      .withColumn("__sel_pid", spark_partition_id())
      .checkpointLinted()
    val totals = skinny.groupBy(col("__sel_pid"))
      .agg(sum(col(tokCol).cast("long")).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (totals.isEmpty) -1 else totals.keys.max
    val offsets = (0 to maxPid)
      .scanLeft(0L)((acc, pid) => acc + totals.getOrElse(pid, 0L))
    val spark = docs.sparkSession
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 to maxPid).map(p =>
          org.apache.spark.sql.Row(p, offsets(p))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__off_pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__off_base",
          org.apache.spark.sql.types.LongType))))
    val perPart = Window.partitionBy(col("__sel_pid"))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    skinny
      .join(broadcast(offDf), col("__sel_pid") === col("__off_pid"))
      .withColumn("cum_tokens",
        col("__off_base") + sum(col(tokCol).cast("long")).over(perPart))
      .filter(col("cum_tokens") <= lit(budget))
      .drop("__sel_pid", "__off_pid", "__off_base")
  }

  def mixtureResample(
      docs: DataFrame, stratumCol: String, idCol: String,
      targets: Map[String, (Int, Int)]): DataFrame = {
    require(targets.values.forall { case (num, den) => num >= 0 && den > 0 },
      s"need non-negative weights with positive denominators, got $targets")
    val spark = docs.sparkSession
    // stratum cardinality rows — tiny at any corpus scale; ONE action
    // (the total is summed driver-side), so the corpus is scanned
    // exactly twice overall: census + the returned filter
    val countRows = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("cnt")).collect()
    val total = countRows.map(_.getLong(1)).sum
    val thresholds = countRows.flatMap { r =>
      val stratum = r.getString(0)
      val cnt = r.getLong(1)
      targets.get(stratum).map { case (num, den) =>
        val t = ((BigInt(num) * total * Granularity) /
          (BigInt(den) * cnt)).min(BigInt(Granularity)).toLong
        // capped strata keep ALL rows: "g" sorts above every lowercase
        // hex string ("ffff" < "g"), whereas printf'ing 0x10000 would
        // yield "10000", which sorts BELOW "a***" prefixes
        stratum -> (if (t >= Granularity) "g" else f"$t%04x")
      }
    }.toMap
    // internal names prefixed so they can't collide with caller columns
    val tDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        thresholds.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__mix_stratum",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__mix_keep_below",
          org.apache.spark.sql.types.StringType))))
    docs
      .join(broadcast(tDf), col(stratumCol) === col("__mix_stratum"))
      .filter(substring(md5(col(idCol).cast("string")), 1, 4) <
        col("__mix_keep_below"))
      .drop("__mix_stratum", "__mix_keep_below")
  }
}
