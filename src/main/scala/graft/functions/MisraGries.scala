package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator — the
  * bounded-memory corpus-analysis primitive (hot tokens, hot join
  * keys) a 100 TB stream can't answer with an exact groupBy when the
  * key space is unbounded: the sketch holds at most `k − 1` counters
  * regardless of input size, one partial sketch per partition, merged
  * associatively like any other aggregation buffer.
  *
  * Guarantees (Misra & Gries 1982; merge rule and any-merge-order
  * bound from Agarwal et al., "Mergeable Summaries", PODS 2012):
  * for every item, `0 ≤ true_count − estimate ≤ n/k` (n = stream
  * length), so any item with true frequency > n/k MUST survive in the
  * final counter set — under ANY partitioning and merge order. The
  * surviving set may additionally carry sub-threshold items; the
  * driver gate (`q_text_heavy_hitters`) therefore asserts only the
  * deterministic direction: exact-top ⊆ sketch, plus the two-sided
  * estimate bound.
  *
  * Reduce inserts with weight 1; merge adds counters pointwise; both
  * then shrink: if more than `k − 1` counters are positive, subtract
  * the k-th largest value from every counter and drop non-positives
  * (for a single insert this degenerates to the classic
  * decrement-all-by-one). The buffer rides Spark's map encoder, so
  * partial aggregation, spilling, and AQE re-planning all work
  * unmodified.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, s"k=$k out of range")
  private val cap = k - 1

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    if (x == null) b else shrink(b.updated(x, b.getOrElse(x, 0L) + 1L))

  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    // fold the smaller sketch into the larger — both are ≤ k entries,
    // this just halves the update count
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    shrink(small.foldLeft(big) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    })
  }

  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= cap) m
    else {
      // subtract the k-th largest count from every counter and drop
      // non-positives: at most k − 1 strictly-greater entries survive,
      // and the per-item mass removed is covered by the n/k bound
      val dec = m.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      m.collect { case (t, c) if c > dec => t -> (c - dec) }
    }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** Column function: `heavy_hitters(k)(stringCol)` → map(item →
    * underestimated count, ≤ k−1 entries). */
  def heavyHitters(k: Int): Column => Column = {
    val agg = org.apache.spark.sql.functions.udaf(
      new MisraGriesAggregator(k), Encoders.STRING)
    c => agg(c)
  }
}
