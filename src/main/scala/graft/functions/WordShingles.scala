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

  /** One pass over the (space-trimmed, lower-cased) UTF-8 bytes via
    * the shared [[Tokenize]] scanner (split('\s+', -1) semantics,
    * boundary empty tokens included — bit-equal to the declarative
    * form on EVERY input, fuzzed in RandomizedPropertySpec). Public
    * because generated code calls it. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val s = input.trim().toLowerCase()
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var m = 0
    Tokenize.foreachToken(s) { (a, b) =>
      if (m == starts.length) {
        starts = java.util.Arrays.copyOf(starts, m * 2)
        ends = java.util.Arrays.copyOf(ends, m * 2)
      }
      starts(m) = a; ends(m) = b; m += 1
    }
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
