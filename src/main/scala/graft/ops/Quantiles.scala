package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Deterministic two-pass histogram quantiles — the 100 TB alternative
  * to both the exact per-group sort (`percentile` holds every group
  * value in one buffer) and the t-digest sketch (`approx_percentile`,
  * whose merge state is float-accumulated and engine-specific, so its
  * gate can only ever be invariant-checked).
  *
  * Plan shape: two linear scans and two tiny exchanges —
  *   1. per-group (min, max, count) partial aggregate (group-count
  *      rows on the wire);
  *   2. per-(group, bucket) counts — at most `buckets` rows per group
  *      on the wire — joined back against the broadcast stats frame.
  * The quantile selection runs on the (groups × buckets)-row result:
  * driver-scale metadata, never data-scale.
  *
  * Every step is INTEGER math: values are taken as exact BIGINT (the
  * caller scales decimals, e.g. cents), bucket =
  * `((v − min) · B) div (max − min + 1)`, target rank =
  * `ceil(q·n)` as `(n·num + den − 1) div den`, and the estimate is the
  * bucket's inclusive upper edge `min + ceil((b+1)·range / B) − 1`
  * clamped to max. Integer-only means DuckDB replays the ENTIRE
  * computation bit-identically (the q_bloom_exact/q_hll_exact
  * pattern), so the gate is exact-value, not invariant: the estimate
  * carries a PROVEN error bound of one bucket width,
  * `range div B + 1`, asserted against the true sorted quantile in
  * `QuantilesSpec`.
  */
object Quantiles {

  /** Exact rational quantile: `num/den` of the way up the sorted
    * group (0 < num ≤ den). rank = ceil(n·num/den), 1-based. */
  final case class Q(name: String, num: Int, den: Int) {
    require(num > 0 && num <= den, s"quantile $num/$den out of (0,1]")
  }

  /** Per-group histogram quantiles of an exact integral column.
    *
    * @param df        input frame
    * @param valueCol  BIGINT-exact value expression (scale decimals
    *                  to integers first — cents, micros, …)
    * @param groupCol  grouping column
    * @param buckets   histogram resolution B; error ≤ range/B + 1
    * @param qs        quantiles as exact rationals
    * @return one row per group: group, n, vmin, vmax, err_bound, and
    *         per quantile `<name>_bucket` + `<name>_est` (all BIGINT)
    */
  def histogramQuantiles(
      df: DataFrame,
      valueCol: Column,
      groupCol: Column,
      buckets: Int = 256,
      qs: Seq[Q] = Seq(Q("p50", 1, 2), Q("p90", 9, 10), Q("p99", 99, 100)))
      : DataFrame = {
    require(buckets > 0)
    // nulls carry no rank information; excluded up front so bucket
    // cumulative counts are over ranked values only
    val vals = df.select(groupCol.as("g"), valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)

    // pass 1: per-group envelope — group-count rows, broadcast back
    val stats = vals.groupBy(col("g"))
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        count(lit(1)).as("n"))

    // pass 2: bucket counts. `div` (not `/`) keeps the math in exact
    // integer floor-division; range ≥ 1 so the last value lands in
    // bucket B−1 exactly.
    val bucketed = vals
      .join(broadcast(stats), "g")
      .withColumn("range", col("vmax") - col("vmin") + lit(1L))
      .withColumn("bucket",
        expr(s"((v - vmin) * ${buckets.toLong}L) div range"))
      .groupBy(col("g"), col("n"), col("vmin"), col("vmax"), col("range"),
        col("bucket"))
      .agg(count(lit(1)).as("cnt"))

    // cumulative counts + selection: (groups × B) rows — metadata scale
    val cum = bucketed.withColumn("cum",
      sum(col("cnt")).over(
        Window.partitionBy(col("g")).orderBy(col("bucket"))))

    val qCols = qs.flatMap { q =>
      val target =
        expr(s"(n * ${q.num}L + ${q.den - 1}L) div ${q.den}L")
      val b = min(when(col("cum") >= target, col("bucket"))).as(s"${q.name}_bucket")
      Seq(b)
    }
    val picked = cum.groupBy(col("g"), col("n"), col("vmin"), col("vmax"),
      col("range")).agg(qCols.head, qCols.tail: _*)

    // estimate = the picked bucket's inclusive upper edge, clamped to
    // the group max. Bucket b holds offsets [ceil(b·range/B),
    // ceil((b+1)·range/B) − 1] under floor-division bucketing, so the
    // edge uses CEILING division — floor would undershoot by one
    // whenever range < B (surfaced by the constant-group spec case).
    qs.foldLeft(picked) { (acc, q) =>
      acc.withColumn(s"${q.name}_est",
        least(col("vmax"),
          col("vmin") + expr(
            s"((${q.name}_bucket + 1) * range + ${buckets - 1}L)" +
              s" div ${buckets.toLong}L") -
            lit(1L)))
    }
      .withColumn("err_bound", expr(s"range div ${buckets.toLong}L") + lit(1L))
      .drop("range")
  }

  /** EXACT per-group quantile WITHOUT a sort (round-11): iterative
    * histogram refinement. Each round re-buckets only the values
    * inside the surviving bucket's range and rebases the rank target,
    * shrinking the candidate range ×B per round; after
    * `refinePasses`, a final per-VALUE count pass (the range is now
    * ≤ B, or close) reads the exact rank-`ceil(n·num/den)` value off
    * the cumulative counts.
    *
    * This is the 100 TB exact-quantile shape: `log_B(range) + 2`
    * linear scans, each ending in a ≤ B-rows-per-group partial
    * aggregate — no global sort, no per-group value buffer (contrast
    * `percentile`), no approximation (contrast `approx_percentile` /
    * [[histogramQuantiles]]). Integer-only throughout, so DuckDB
    * replays every round's bounds, targets, and the final value
    * bit-identically (`q_quantile_exact`). The final pass aggregates
    * per distinct VALUE in the surviving range — pick `refinePasses`
    * so range/B^passes is comfortably small (2 passes take a 10⁷-cent
    * domain to ≤ 153 distinct candidate values). */
  def exactQuantileByRefinement(
      df: DataFrame,
      valueCol: Column,
      groupCol: Column,
      num: Int,
      den: Int,
      buckets: Int = 256,
      refinePasses: Int = 2): DataFrame = {
    require(num > 0 && num <= den && buckets > 1)
    val B = buckets.toLong
    // skinny (g, v) pairs, scanned refinePasses+2 times — cut lineage
    // once so each pass re-reads 16 bytes/row, not the source scan
    val vals = df.select(groupCol.as("g"), valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .checkpointLinted()

    var state = vals.groupBy(col("g")).agg(
      min(col("v")).as("lo"), max(col("v")).as("hi"),
      expr(s"(count(1) * ${num}L + ${den - 1}L) div ${den}L").as("target"))

    for (_ <- 1 to refinePasses) {
      val cnts = vals.join(broadcast(state), "g")
        .filter(col("v").between(col("lo"), col("hi")))
        .withColumn("range", col("hi") - col("lo") + lit(1L))
        .withColumn("bucket", expr(s"((v - lo) * ${B}L) div range"))
        .groupBy(col("g"), col("lo"), col("hi"), col("range"), col("target"),
          col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val byBucket = Window.partitionBy(col("g")).orderBy(col("bucket"))
      val cum = cnts.withColumn("cum", sum(col("cnt")).over(byBucket))
      state = cum.filter(col("cum") >= col("target"))
        .withColumn("__rn", row_number().over(byBucket))
        .filter(col("__rn") === 1)
        .select(col("g"),
          (col("lo") + expr(s"(bucket * range + ${B - 1}L) div ${B}L")).as("lo"),
          least(col("hi"), col("lo") +
            expr(s"((bucket + 1) * range + ${B - 1}L) div ${B}L") - lit(1L))
            .as("hi"),
          (col("target") - (col("cum") - col("cnt"))).as("target"))
    }

    // final pass: per-VALUE counts inside the surviving range — the
    // rank-target value is exact
    val byV = Window.partitionBy(col("g")).orderBy(col("v"))
    vals.join(broadcast(state), "g")
      .filter(col("v").between(col("lo"), col("hi")))
      .groupBy(col("g"), col("target"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byV))
      .filter(col("cum") >= col("target"))
      .withColumn("__rn", row_number().over(byV))
      .filter(col("__rn") === 1)
      .select(col("g"), col("v").as("quantile"))
  }
}
