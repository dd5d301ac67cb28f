package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
  * compiled loop per row (~3× on the shingle stage at sf0.1).
  * First-occurrence order is preserved, exactly like array_distinct.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val words = text.split("\\s+")
    if (words.length < n || text.isEmpty) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i <= words.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
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
