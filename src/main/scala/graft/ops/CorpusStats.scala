package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level comparison statistics a long-running ingest pipeline
  * publishes between epochs: how much does dump N+1 overlap dump N
  * (bottom-k sketch Jaccard), and how far has the data distribution
  * drifted (population stability index). Both are built from pure-hash
  * / integer primitives so a SQL oracle replays every value.
  *
  * Scale posture: the overlap sketch reduces each corpus to its k
  * smallest distinct content hashes — one distinct-aggregate exchange
  * per side (the exact-dedup shape) followed by a `TakeOrdered`-style
  * sort-limit whose driver state is k 32-char strings; the corpora
  * themselves never co-shuffle. The PSI reduces each side to a
  * B-row bucket census (one partial-agg exchange over ≤ B·2 rows on
  * the wire after map-side combine); everything after is metadata
  * scale. Both are safe at any corpus size.
  */
object CorpusStats {

  /** Bottom-k sketch overlap (the classic KMV / bottom-k min-hash
    * estimator, e.g. Bar-Yossef et al. 2002): reduce each side to its
    * k lexicographically smallest distinct md5(text) values, take the
    * k smallest of the sketch union S, and estimate
    * `J ≈ |{h ∈ S : h ∈ A ∧ h ∈ B}| / |S|`. md5 is a pure function of
    * the content, so the sketch — and therefore the estimate — is
    * bit-identical across runs, partitionings, and engines.
    *
    * The output row carries the estimator next to the exact Jaccard
    * computed from the full distinct-hash sets (one more distinct
    * aggregate — the audit a gate-scale run affords; at 100 TB one
    * publishes the sketch columns alone, the exact twin exists to
    * measure the estimator). Single row: sketch size, both set sizes,
    * union/intersection tallies, estimated and exact Jaccard. */
  def overlapBottomK(docsA: DataFrame, docsB: DataFrame,
      textCol: String, k: Int): DataFrame = {
    val ha = docsA.select(md5(col(textCol)).as("h")).distinct()
    val hb = docsB.select(md5(col(textCol)).as("h")).distinct()
    val sa = ha.orderBy(col("h")).limit(k)
      .select(col("h"), lit(true).as("in_a"))
    val sb = hb.orderBy(col("h")).limit(k)
      .select(col("h"), lit(true).as("in_b"))
    // bottom-k of the sketch UNION: membership flags survive the merge,
    // so the intersection tally needs no further corpus access
    val s = sa.join(sb, Seq("h"), "full_outer")
      .select(col("h"),
        coalesce(col("in_a"), lit(false)).as("in_a"),
        coalesce(col("in_b"), lit(false)).as("in_b"))
      .orderBy(col("h")).limit(k)
    val est = s.agg(
      count(lit(1)).as("union_k"),
      sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("inter_k"))
    // exact twin over the full distinct-hash sets (gate-scale audit)
    val exact = ha.select(col("h"), lit(true).as("in_a"))
      .join(hb.select(col("h"), lit(true).as("in_b")), Seq("h"), "full_outer")
      .agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("in_b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("n_inter"),
        count(lit(1)).as("n_union"))
    // two 1-row frames; the divisions are single IEEE ops on exact
    // integers, identical in both engines
    est.crossJoin(exact).select(
      lit(k).as("k"),
      col("n_a"), col("n_b"), col("n_union"), col("n_inter"),
      col("union_k"), col("inter_k"),
      (col("inter_k").cast("double") / col("union_k").cast("double"))
        .as("j_est"),
      (col("n_inter").cast("double") / col("n_union").cast("double"))
        .as("j_exact"))
  }

  /** DuckDB replay of [[overlapBottomK]] with the same A/B predicates:
    * same md5 draw, same ORDER BY/LIMIT bottom-k, same IEEE divisions. */
  def overlapOracleSql(table: String, textCol: String, k: Int,
      predA: String, predB: String): String =
    s"""WITH ha AS (SELECT DISTINCT md5($textCol) AS h FROM $table WHERE $predA),
        hb AS (SELECT DISTINCT md5($textCol) AS h FROM $table WHERE $predB),
        sa AS (SELECT h, true AS in_a FROM ha ORDER BY h LIMIT $k),
        sb AS (SELECT h, true AS in_b FROM hb ORDER BY h LIMIT $k),
        s AS (
          SELECT coalesce(sa.h, sb.h) AS h,
            coalesce(in_a, false) AS in_a, coalesce(in_b, false) AS in_b
          FROM sa FULL OUTER JOIN sb ON sa.h = sb.h
          ORDER BY 1 LIMIT $k),
        est AS (
          SELECT count(1) AS union_k,
            CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS inter_k
          FROM s),
        ex AS (
          SELECT
            CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
            CAST(sum(CASE WHEN coalesce(in_a, false) AND coalesce(in_b, false)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_inter,
            count(1) AS n_union
          FROM (SELECT coalesce(ha.h, hb.h) AS h, in_a, in_b
                FROM (SELECT h, true AS in_a FROM ha) ha
                FULL OUTER JOIN (SELECT h, true AS in_b FROM hb) hb
                  ON ha.h = hb.h))
        SELECT $k AS k, n_a, n_b, n_union, n_inter, union_k, inter_k,
          CAST(inter_k AS DOUBLE) / CAST(union_k AS DOUBLE) AS j_est,
          CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS j_exact
        FROM est CROSS JOIN ex"""

  /** Population stability index between two corpus epochs over an
    * integer feature — the drift monitor a production ingest publishes
    * per epoch (PSI > 0.2 is the conventional "investigate" line).
    *
    * The metric is defined on exactly reproducible arithmetic:
    * `buckets` equal-width bins over the GLOBAL envelope
    * (`bucket = (v − min)·B div (max − min + 1)`, exact integer math
    * WIDENED past 64 bits — DECIMAL(38,0) here, HUGEINT in the oracle
    * replay — because `(v − min)·B` overflows BIGINT once the value
    * envelope exceeds Long.MaxValue/B, where Spark would silently wrap
    * while DuckDB errors: the engines would diverge instead of
    * hash-matching), add-½
    * smoothed shares `p_i = (2·c_i + 1)/(2·n + B)` so empty bins stay
    * finite, and per-bin terms `(p_i − q_i)·ln(p_i/q_i)` where the ln
    * argument is one IEEE division of two exact (< 2⁵³) integer
    * products and the ln itself is rule-5b quantized to DECIMAL(18,9)
    * before the multiply; each term re-quantizes before the exact
    * decimal total. Every intermediate is engine-identical.
    *
    * Output: one row per bin (counts + its PSI term) plus a `bucket=-1`
    * total row carrying both epoch sizes and the summed PSI. */
  def psi(docs: DataFrame, valueCol: Column, epochA: Column,
      buckets: Int = 10): DataFrame = {
    val base = docs.select(valueCol.cast("long").as("v"), epochA.as("in_a"))
    val env = base.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val bucketed = base.crossJoin(broadcast(env))
      .withColumn("bucket",
        expr(s"CAST(((CAST(v AS DECIMAL(38,0)) - mn) * $buckets) " +
          s"DIV (CAST(mx AS DECIMAL(38,0)) - mn + 1) AS BIGINT)"))
    val counts = bucketed.groupBy(col("bucket")).agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
    psiFromCensus(counts, buckets)
  }

  /** The bucket census under a PINNED envelope — the incremental form:
    * a production pipeline fixes (mn, mx, buckets) at epoch start (the
    * corpus envelope) and every ingest batch censuses against those
    * bounds, so per-batch partials are ADDITIVE. Out-of-envelope
    * values clamp into the edge bins (a no-op when the envelope spans
    * the data, which is how the gates pin it — the unclamped oracle
    * replay stays value-identical). */
  def psiCensusPinned(docs: DataFrame, valueCol: Column, epochA: Column,
      buckets: Int, mn: Long, mx: Long): DataFrame =
    docs.select(valueCol.cast("long").as("v"), epochA.as("in_a"))
      .withColumn("bucket", expr(
        s"CAST(least(CAST($buckets - 1 AS BIGINT), greatest(0L, " +
          s"((CAST(v AS DECIMAL(38,0)) - ${mn}L) * $buckets) " +
          s"DIV (CAST(${mx}L AS DECIMAL(38,0)) - ${mn}L + 1))) AS BIGINT)"))
      .groupBy(col("bucket")).agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))

  /** Batch-id-keyed census partial — overwrite on the batch directory
    * makes at-least-once replays idempotent by construction (the
    * [[MatView]] posture: the state is an algebraic aggregate, folding
    * is the same aggregation over the union). */
  def writeDriftPartial(census: DataFrame, path: String, batchId: Long): Unit =
    census.write.mode("overwrite").parquet(s"$path/census/batch=$batchId")

  /** Pin the epoch's bucketing contract next to the partials. */
  def writeDriftMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, mn: Long, mx: Long, buckets: Int): Unit = {
    import spark.implicits._
    Seq((mn, mx, buckets)).toDF("mn", "mx", "buckets")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Fold every persisted batch partial and finish the PSI — per-epoch
    * cost is one census-sized scan (B·batches rows), the raw stream is
    * never rescanned. Any batch split of the ingest lands on the same
    * output because the census is additive. */
  def driftFromPartials(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val meta = spark.read.parquet(s"$path/meta").head()
    val buckets = meta.getAs[Int]("buckets")
    val merged = spark.read.parquet(s"$path/census")
      .groupBy(col("bucket"))
      .agg(sum(col("c_a")).as("c_a"), sum(col("c_b")).as("c_b"))
    psiFromCensus(merged, buckets)
  }

  /** Spine-fill + smoothed shares + quantized terms + exact total over
    * an additive (bucket, c_a, c_b) census — shared by the one-shot,
    * pinned-envelope, and fold-from-partials paths, so the batching is
    * value-invisible by construction. */
  def psiFromCensus(counts: DataFrame, buckets: Int): DataFrame = {
    val spark = counts.sparkSession
    val spine = spark.range(0, buckets).select(col("id").as("bucket"))
    val filled = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val tot = filled.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    val b = lit(buckets.toLong)
    val terms = filled.crossJoin(broadcast(tot))
      .withColumn("ln_q",
        log(((col("c_a") * 2 + 1) * (col("n_b") * 2 + b)).cast("double") /
            ((col("c_b") * 2 + 1) * (col("n_a") * 2 + b)).cast("double"))
          .cast("decimal(18,9)"))
      .withColumn("diff",
        (col("c_a") * 2 + 1).cast("double") / (col("n_a") * 2 + b).cast("double") -
        (col("c_b") * 2 + 1).cast("double") / (col("n_b") * 2 + b).cast("double"))
      .withColumn("term_q",
        (col("diff") * Similarity.decToDouble(col("ln_q")))
          .cast("string").cast("decimal(18,9)"))
    val perBucket = terms.select(col("bucket"), col("c_a"), col("c_b"),
      Similarity.decToDouble(col("term_q")).as("psi_term"))
    val total = terms.agg(
      max(col("n_a")).as("c_a"), max(col("n_b")).as("c_b"),
      Similarity.decToDouble(
        sum(col("term_q")).cast("decimal(38,9)")).as("psi_term"))
      .select(lit(-1L).as("bucket"), col("c_a"), col("c_b"), col("psi_term"))
    perBucket.unionByName(total).orderBy(col("bucket"))
  }

  /** An epoch's bottom-k content sketch: the k lexicographically
    * smallest DISTINCT md5(text) values — the persistable half of
    * [[overlapBottomK]]. */
  def sketchBottomK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(md5(col(textCol)).as("h")).distinct()
      .orderBy(col("h")).limit(k)

  /** Persist an epoch sketch (k rows + a meta row) — write once per
    * epoch, estimate overlap against ANY other epoch forever without
    * rescanning either corpus. */
  def writeSketch(docs: DataFrame, textCol: String, k: Int,
      path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    sketchBottomK(docs, textCol, k).write.mode("overwrite")
      .parquet(s"$path/sketch")
    Seq(k).toDF("k").write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Merge two bottom-k sketches: the k smallest of the distinct
    * union. KMV sketches are ASSOCIATIVE under this merge —
    * `merge(sketch(A1), sketch(A2)) = sketch(A1 ∪ A2)` exactly (any h
    * among the k smallest of the union is among the k smallest of its
    * half) — so epoch sketches build independently and fold without
    * touching the corpora, the [[Membership.mergeBits]] posture. */
  def mergeSketches(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.select(col("h")).unionByName(b.select(col("h"))).distinct()
      .orderBy(col("h")).limit(k)

  /** The overlap estimate from two (persisted) sketches alone — the
    * 100 TB serve path: 2k rows in, one row out, no corpus access. */
  def overlapFromSketches(sa: DataFrame, sb: DataFrame, k: Int): DataFrame = {
    val s = sa.select(col("h"), lit(true).as("in_a"))
      .join(sb.select(col("h"), lit(true).as("in_b")), Seq("h"), "full_outer")
      .select(col("h"),
        coalesce(col("in_a"), lit(false)).as("in_a"),
        coalesce(col("in_b"), lit(false)).as("in_b"))
      .orderBy(col("h")).limit(k)
    s.agg(
      count(lit(1)).as("union_k"),
      sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("inter_k"))
      .select(lit(k).as("k"), col("union_k"), col("inter_k"),
        (col("inter_k").cast("double") / col("union_k").cast("double"))
          .as("j_est"))
  }

  /** Read a persisted epoch sketch back. */
  def readSketch(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(s"$path/sketch")

  /** DuckDB replay of [[overlapFromSketches]] over from-scratch
    * sketches of the two predicates — the artifact round-trip and any
    * associative build split must be value-invisible. */
  def overlapSketchOracleSql(table: String, textCol: String, k: Int,
      predA: String, predB: String): String =
    s"""WITH ha AS (SELECT DISTINCT md5($textCol) AS h FROM $table WHERE $predA),
        hb AS (SELECT DISTINCT md5($textCol) AS h FROM $table WHERE $predB),
        sa AS (SELECT h, true AS in_a FROM ha ORDER BY h LIMIT $k),
        sb AS (SELECT h, true AS in_b FROM hb ORDER BY h LIMIT $k),
        s AS (
          SELECT coalesce(sa.h, sb.h) AS h,
            coalesce(in_a, false) AS in_a, coalesce(in_b, false) AS in_b
          FROM sa FULL OUTER JOIN sb ON sa.h = sb.h
          ORDER BY 1 LIMIT $k)
        SELECT $k AS k, count(1) AS union_k,
          CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
            AS inter_k,
          CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS DOUBLE) /
            CAST(count(1) AS DOUBLE) AS j_est
        FROM s"""

  /** DuckDB replay of [[psi]]: same envelope, same integer bucketing,
    * same smoothed shares, VARCHAR-hopped lns/terms, exact-decimal
    * total. `valueExpr` must be the engine-side value column's SQL. */
  def psiOracleSql(table: String, valueExpr: String, predA: String,
      buckets: Int = 10): String =
    s"""WITH base AS (
          SELECT CAST($valueExpr AS BIGINT) AS v,
            CASE WHEN $predA THEN true ELSE false END AS in_a
          FROM $table),
        env AS (SELECT min(v) AS mn, max(v) AS mx FROM base),
        counts AS (
          SELECT CAST(((CAST(v AS HUGEINT) - mn) * $buckets)
                      // (CAST(mx AS HUGEINT) - mn + 1) AS BIGINT) AS bucket,
            CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
            CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
          FROM base CROSS JOIN env GROUP BY 1),
        filled AS (
          SELECT sp.bucket, coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
          FROM (SELECT unnest(range(0, $buckets)) AS bucket) sp
          LEFT JOIN counts ON counts.bucket = sp.bucket),
        tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
                       CAST(sum(c_b) AS BIGINT) AS n_b FROM filled),
        terms AS (
          SELECT bucket, c_a, c_b, n_a, n_b,
            CAST(CAST(
              (CAST((c_a * 2 + 1) AS DOUBLE) / CAST((n_a * 2 + $buckets) AS DOUBLE) -
               CAST((c_b * 2 + 1) AS DOUBLE) / CAST((n_b * 2 + $buckets) AS DOUBLE)) *
              CAST(CAST(CAST(CAST(
                ln(CAST((c_a * 2 + 1) * (n_b * 2 + $buckets) AS DOUBLE) /
                   CAST((c_b * 2 + 1) * (n_a * 2 + $buckets) AS DOUBLE))
                AS VARCHAR) AS DECIMAL(18,9)) AS VARCHAR) AS DOUBLE)
              AS VARCHAR) AS DECIMAL(18,9)) AS term_q
          FROM filled CROSS JOIN tot)
        SELECT bucket, c_a, c_b,
          CAST(CAST(term_q AS VARCHAR) AS DOUBLE) AS psi_term
        FROM terms
        UNION ALL
        SELECT -1 AS bucket, max(n_a) AS c_a, max(n_b) AS c_b,
          CAST(CAST(CAST(sum(term_q) AS DECIMAL(38,9)) AS VARCHAR) AS DOUBLE)
            AS psi_term
        FROM terms
        ORDER BY bucket"""
}
