package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch as a typed Aggregator — the frequency-ESTIMATE
  * companion to the [[MisraGriesAggregator]] membership sketch: a
  * `depth × width` grid of counters answers point queries
  * `est(item) = min over rows of counter[row][hash_row(item) % width]`
  * in O(width·depth) memory no matter the key cardinality.
  *
  * Guarantees (Cormode & Muthukrishnan 2005): `est ≥ true_count`
  * ALWAYS (counters only over-count on collisions), and
  * `est ≤ true_count + e·n/width` with probability `1 − e^(−depth)`
  * per item. Unlike Misra–Gries, the merge is a pointwise counter add
  * — fully commutative AND associative — so the final sketch (and
  * therefore every estimate) is bit-identical under ANY partitioning
  * and merge order, not merely bounded: asserted by exact sketch
  * equality across repartitionings in CountMinSpec.
  *
  * Row hashes are seeded MurmurHash3 over the item string — pure
  * functions, stable across JVMs and runs. */
class CountMinAggregator(width: Int, depth: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(width >= 2 && depth >= 1 && width.toLong * depth <= (1 << 22),
    s"sketch ${width}x$depth out of range")

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(b: Array[Long], x: String): Array[Long] = {
    if (x != null) {
      var d = 0
      while (d < depth) {
        b(d * width + CountMin.cell(x, d, width)) += 1
        d += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** WEIGHTED count-min fold: one (item, count) census row adds `count`
  * to the item's counters — pointwise adds are abelian, so
  * `sketch(census)` is BIT-IDENTICAL to `sketch(token stream)` while
  * reading a vocabulary-sized input instead of re-scanning every token
  * (at corpus scale the tokenize pass IS the cost; asserted equal in
  * CountMinSpec). */
class CountMinWeightedAggregator(width: Int, depth: Int)
    extends Aggregator[(String, Long), Array[Long], Array[Long]] {
  require(width >= 2 && depth >= 1 && width.toLong * depth <= (1 << 22),
    s"sketch ${width}x$depth out of range")

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(b: Array[Long], x: (String, Long)): Array[Long] = {
    if (x != null && x._1 != null) {
      var d = 0
      while (d < depth) {
        b(d * width + CountMin.cell(x._1, d, width)) += x._2
        d += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object CountMin {
  /** Row `row`'s counter index for `item`. */
  def cell(item: String, row: Int, width: Int): Int =
    Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(item, row), width)

  /** Point query against a finished sketch. */
  def estimate(sketch: Array[Long], item: String, width: Int, depth: Int): Long = {
    var m = Long.MaxValue
    var d = 0
    while (d < depth) {
      m = math.min(m, sketch(d * width + cell(item, d, width)))
      d += 1
    }
    m
  }

  /** Column function: `count_min(width, depth)(stringCol)` → the flat
    * depth×width counter array. */
  def sketch(width: Int, depth: Int): Column => Column = {
    val agg = org.apache.spark.sql.functions.udaf(
      new CountMinAggregator(width, depth), Encoders.STRING)
    c => agg(c)
  }

  /** Weighted column function over a census:
    * `count_min_w(width, depth)(termCol, countCol)`. */
  def sketchWeighted(width: Int, depth: Int): (Column, Column) => Column = {
    val agg = org.apache.spark.sql.functions.udaf(
      new CountMinWeightedAggregator(width, depth),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    (c, w) => agg(c, w)
  }
}
