package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** THE whitespace tokenizer shared by every native text expression
  * ([[WordShingles]], [[WordShingleHashes]], [[SimHash64]]) — one
  * definition so the hashed index, the string/audit form, and the
  * SimHash signatures can never desync on token boundaries.
  *
  * Semantics replicate Spark's `split(col, '\s+')` (limit -1) exactly:
  * Java's `\s` is the six ASCII whitespace bytes, which in UTF-8 never
  * occur inside a multi-byte character, and the -1 limit keeps the
  * empty boundary tokens — leading/trailing non-space whitespace that
  * survives the space-only `trim()`, and the single empty token of a
  * fully-empty input. Asserted equal to the declarative `split` form
  * on whitespace-fuzzed inputs in `RandomizedPropertySpec`. */
private[functions] object Tokenize {

  @inline def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Invoke `f(startByte, endByte)` for every token of `s`, in order.
    * `s` must already be trimmed/lower-cased by the caller. */
  @inline def foreachToken(s: UTF8String)(f: (Int, Int) => Unit): Unit = {
    val n = s.numBytes
    var i = 0
    var start = 0
    while (i < n) {
      if (isWs(s.getByte(i))) {
        f(start, i)
        i += 1
        while (i < n && isWs(s.getByte(i))) i += 1
        start = i
      } else i += 1
    }
    f(start, n) // final token; empty iff input ends in whitespace or is empty
  }
}
