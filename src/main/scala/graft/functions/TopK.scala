package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-N as a bounded-memory typed Aggregator — the
  * scale-safe form of `row_number() OVER (PARTITION BY g ORDER BY s
  * DESC) <= n`.
  *
  * A window top-N shuffles EVERY row of a group to one task and sorts
  * it there, so one hot group (a crawl's dominant domain at 100 TB)
  * becomes a single straggler task sorting billions of rows. This
  * aggregator instead rides normal partial aggregation: each map task
  * keeps at most `4·n` (score, id) pairs per group it sees, partials
  * merge associatively on the reduce side, and the hot group's input
  * collapses to `tasks × n` pairs BEFORE the shuffle — the same
  * map-side-combine shape as any sum/count.
  *
  * Selection order is (score desc, id asc): ties broken by the
  * smaller id, so the kept set is a pure function of the data —
  * reproducible across runs, partitionings, and engines, and exactly
  * expressible as ANSI `row_number()` for the oracle.
  *
  * Buffer grows lazily to `4·n` before re-sorting (amortized
  * O(log n) per row) and is trimmed to `n` on merge/finish; it rides
  * Spark's product encoder, so spilling and AQE re-planning work
  * unmodified.
  */
class TopKAggregator(n: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(n >= 1, s"n=$n out of range")

  // best-first: score desc, then id asc
  private def ord: Ordering[(Long, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(
      b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
    val grown = b :+ x
    if (grown.size <= 4 * n) grown else grown.sorted(ord).take(n)
  }

  override def merge(
      a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(n)

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.sorted(ord).take(n)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

object TopK {
  /** Column function: `topBy(n)(scoreCol, idCol)` → array of
    * `struct<_1: score, _2: id>`, the group's exact top-n under
    * (score desc, id asc). */
  def topBy(n: Int): (Column, Column) => Column = {
    val agg = org.apache.spark.sql.functions.udaf(
      new TopKAggregator(n),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    (score, id) => agg(score, id)
  }
}
