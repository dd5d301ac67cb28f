package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document as a native Catalyst expression: one
  * compiled pass per row, no explode, no shuffle.
  *
  * Semantics are IDENTICAL to the round-1 aggregate formulation (kept
  * as [[graft.ops.Dedup.simhashAgg]] and asserted equal in DedupSpec):
  * tokens are `split(lower(trim(text)), '\s+')`, each token is hashed
  * with Spark's `xxhash64` (seed 42 — this expression calls the same
  * XXH64 kernel on the same UTF-8 bytes), every occurrence votes ±1 per
  * bit, and bit b of the signature is set iff its vote total is
  * strictly positive.
  *
  * Why an expression and not the explode + 64-conditional-sum plan:
  * SimHash is a PER-DOCUMENT value — distributing its per-token votes
  * through a (doc_id, token_hash) shuffle and a 64-wide aggregate (the
  * round-1 shape, the bench's slowest query at 6.4 s) buys nothing.
  * This runs embarrassingly parallel on the scan, and the whole
  * signature costs one regex split + one XXH64 per token. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].trim().toLowerCase()
      .split(SimHash64.wsPattern, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  private val wsPattern = UTF8String.fromString("\\s+")

  def register(s: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      (exprs: Seq[Expression]) => SimHash64(exprs.head), "built-in")
  }

  /** Column entry point (requires [[register]] on the session). */
  def simhash64(colName: String): Column = expr(s"simhash64($colName)")
}
