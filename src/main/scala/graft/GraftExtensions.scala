package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSigs, PolyHash64, SimHash64, WordShingleHashes, WordShingles}

/** SparkSessionExtensions entry point: installs the engine's native
  * expressions into any session at build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * }}}
  *
  * or `.withExtensions(new GraftExtensions)`. This is the deployment-
  * grade registration path (cluster-wide via config, survives session
  * cloning); the per-session `register(spark)` helpers on each function
  * object remain for ad-hoc use. No custom Rule/Strategy is injected:
  * per SURVEY.md §4 the reference needs none — Catalyst's built-in
  * optimizations cover every plan this engine produces, and the three
  * places where expression-level evaluation wins are exactly these
  * functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("poly_hash64"),
      new ExpressionInfo(classOf[PolyHash64].getName, "poly_hash64"),
      (exprs: Seq[Expression]) => PolyHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(
        exprs.head, exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getName, "word_shingle_hashes"),
      (exprs: Seq[Expression]) => WordShingleHashes(
        exprs.head, exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => MinHashSigs(
        exprs.head, exprs(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
  }
}
