package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of lower(trim(text)) as a native Catalyst
  * expression.
  *
  * Semantics are IDENTICAL to the declarative form
  * `array_distinct(transform(sequence(...), i -> concat(words[i], ' ',
  * …)))` over `split(lower(trim(text)), '\s+')` (graft.ops.Text) and to
  * the DuckDB oracle's `regexp_split_to_array(lower(trim(text)),
  * '\s+')` list comprehension — verified by the dedup queries'
  * oracle hash-matches. The difference is purely mechanical: Catalyst
  * evaluates higher-order-function lambdas interpreted, one closure
  * dispatch per element per subexpression, which made shingling the
  * single hottest stage of the dedup pipeline. This expression runs one
  * compiled loop per row, participates in whole-stage codegen via
  * `doGenCode` (the round-2 version was CodegenFallback), and
  * tokenizes by scanning UTF-8 bytes for ASCII whitespace runs — no
  * per-row regex, no String materialization; each shingle is assembled
  * once directly into its UTF-8 byte array. First-occurrence order is
  * preserved, exactly like array_distinct.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  private val Empty = new GenericArrayData(Array.empty[Any])

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** One pass over the (space-trimmed, lower-cased) UTF-8 bytes. Token
    * semantics replicate Spark's `split(col, '\s+')` (limit -1)
    * exactly: Java's `\s` is the six ASCII whitespace bytes, which in
    * UTF-8 never occur inside a multi-byte character; limit -1 keeps
    * BOTH boundary empty tokens (leading and trailing) when
    * non-space whitespace survives the space-only trim(). Public
    * because generated code calls it. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val s = input.trim().toLowerCase()
    val nb = s.numBytes
    if (nb == 0) return Empty
    // token boundaries
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var m = 0
    @inline def push(a: Int, b: Int): Unit = {
      if (m == starts.length) {
        starts = java.util.Arrays.copyOf(starts, m * 2)
        ends = java.util.Arrays.copyOf(ends, m * 2)
      }
      starts(m) = a; ends(m) = b; m += 1
    }
    var i = 0
    var start = 0
    while (i < nb) {
      if (isWs(s.getByte(i))) {
        push(start, i)
        i += 1
        while (i < nb && isWs(s.getByte(i))) i += 1
        start = i
      } else i += 1
    }
    // final token — unconditional: when the text ends in (non-space)
    // whitespace that survives Spark's space-only trim(), this is the
    // empty boundary token that split's limit -1 keeps. Matching it
    // exactly keeps the native and declarative forms bit-equal on
    // every input (fuzzed in RandomizedPropertySpec), not just on
    // corpus-shaped text.
    push(start, nb)
    if (m < n) return Empty
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j <= m - n) {
      var len = n - 1
      var k = 0
      while (k < n) { len += ends(j + k) - starts(j + k); k += 1 }
      val bytes = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) { bytes(pos) = ' '.toByte; pos += 1 }
        var t = starts(j + k)
        val e = ends(j + k)
        while (t < e) { bytes(pos) = s.getByte(t); pos += 1; t += 1 }
        k += 1
      }
      seen.add(UTF8String.fromBytes(bytes))
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var q = 0
    while (it.hasNext) { out(q) = it.next(); q += 1 }
    new GenericArrayData(out)
  }

  def register(s: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    castToImpl(s).sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      (exprs: Seq[Expression]) => {
        val n = exprs(1).eval(null).asInstanceOf[Int]
        WordShingles(exprs.head, n)
      }, "built-in")
  }

  /** Column entry point (requires [[register]] on the session). */
  def wordShingles(colName: String, n: Int): Column =
    expr(s"word_shingles($colName, $n)")
}
