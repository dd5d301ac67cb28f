package graft.functions

import java.math.{BigDecimal => JBigDecimal}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface demo (SURVEY.md §2.1 — the reference's pandas
  * helpers map to built-ins; this covers the custom-aggregate
  * extension point): exact second-moment accumulation over DECIMAL
  * input, finishing to population variance.
  *
  * The buffer keeps (n, Σx, Σx²) as exact BigDecimals — merge is
  * associative and commutative, so map-side partial aggregation and
  * any shuffle order give the identical result. The finish step
  * parses the exact decimal strings into doubles (the same
  * decimal→string→double hop as the rest of the engine) and applies
  * the double formula, matching the DuckDB oracle bit-for-bit.
  */
class MomentsAggregator
    extends Aggregator[JBigDecimal, MomentsAggregator.Buf, Double] {
  import MomentsAggregator.Buf

  override def zero: Buf = Buf(0L, JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: Buf, x: JBigDecimal): Buf =
    if (x == null) b
    else Buf(b.n + 1, b.s.add(x), b.s2.add(x.multiply(x)))

  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.n + b.n, a.s.add(b.s), a.s2.add(b.s2))

  override def finish(b: Buf): Double =
    if (b.n == 0) Double.NaN
    else {
      val s = java.lang.Double.parseDouble(b.s.toPlainString)
      val s2 = java.lang.Double.parseDouble(b.s2.toPlainString)
      (s2 - s * s / b.n) / b.n
    }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object MomentsAggregator {
  /** n, Σx, Σx² — BigDecimals ride Spark's DECIMAL(38,18) encoder;
    * inputs carry ≤4 fractional digits so scale-18 storage is exact. */
  case class Buf(n: Long, s: JBigDecimal, s2: JBigDecimal)

  /** Column function: `var_pop_exact(decimalCol)`. */
  val varPopExact =
    org.apache.spark.sql.functions.udaf(new MomentsAggregator, Encoders.DECIMAL)
}
