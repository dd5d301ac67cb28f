package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (build brief / SURVEY.md §7.5): tokenization, shingling, quality
  * metrics, stopword scoring, heuristic language ID.
  *
  * Everything here is a pure Column expression over `functions._`
  * built-ins — codegen'd, shuffle-free, and replicable in ANSI SQL for
  * the DuckDB oracle. No UDFs in the hot path. The exceptions keep the
  * same shuffle-free shape: [[chunks]]' generate/explode and
  * [[spanCorrupt]]'s partition-local seeded-mask kernel. */
object Text {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct n-word shingles over an ALREADY-MATERIALIZED token-array
    * column. Callers must project the token array into its own column
    * first (see [[graft.ops.Dedup.docShingles]]): passing `tokens(text)`
    * directly would inline the full split-regex subtree into every
    * `element_at` inside the lambda, re-tokenizing the document
    * O(shingles × n) times — measured 16× slower at sf0.1. */
  def shinglesFromWords(ws: Column, n: Int): Column = {
    val idxs = when(size(ws) >= n, sequence(lit(0), size(ws) - n))
      .otherwise(array().cast("array<int>"))
    array_distinct(
      transform(idxs, i => {
        // concat_ws over the n consecutive tokens
        (1 until n).foldLeft(element_at(ws, i + 1)) { (acc, k) =>
          concat(acc, lit(" "), element_at(ws, i + k + 1))
        }
      }))
  }

  /** Convenience single-expression form (tokenizes inline — fine for
    * ad-hoc use, see [[shinglesFromWords]] for the hot path). */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromWords(tokens(text), n)

  /** ALL n-word shingles with duplicates KEPT — the repetition metrics
    * (duplicate-n-gram fraction à la the Gopher/C4 pretraining filters)
    * need total vs distinct counts, so this is [[shinglesFromWords]]
    * without the `array_distinct`. Same materialized-token-array
    * contract. */
  def ngramsAll(ws: Column, n: Int): Column = {
    val idxs = when(size(ws) >= n, sequence(lit(0), size(ws) - n))
      .otherwise(array().cast("array<int>"))
    transform(idxs, i => {
      (1 until n).foldLeft(element_at(ws, i + 1)) { (acc, k) =>
        concat(acc, lit(" "), element_at(ws, i + k + 1))
      }
    })
  }

  /** Number of whitespace-separated tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer counts: runs of letters, runs of digits,
    * single punctuation marks. `regexp_count` instead of
    * `size(regexp_extract_all(…))`: the same non-overlapping match
    * count without materializing a match ARRAY per document — these
    * counters run over every doc in the quality/corpus-prep hot path,
    * and the array existed only to be measured. */
  def alphaTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+"))
  def digitTokenCount(text: Column): Column =
    regexp_count(text, lit("[0-9]+"))
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?]"))

  /** Occurrences of any word in `words` (word-boundary matched). */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text),
      lit("\\b(" + words.map(java.util.regex.Pattern.quote).mkString("|") + ")\\b"))

  /** Marker vocabularies for the heuristic language-ID scorer. Scores
    * are word-boundary hit counts; the guess is the arg-max with an
    * alphabetical tie-break. (A real system would use char-n-gram
    * models; the *operator shape* — score columns + deterministic
    * arg-max — is what matters at 100 TB, and it is one projection.) */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "data", "table"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "datos", "tabla"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "daten", "tabelle"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "données", "tableau")
  )

  /** (langScoreCols, guessCol): one score column per language plus the
    * deterministic arg-max guess. */
  def langId(text: Column): (Seq[(String, Column)], Column) = {
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> stopwordCount(text, words)
    }
    val guess = scores.tail.foldLeft(
      (scores.head._2, lit(scores.head._1))) { case ((bestScore, bestLang), (lang, score)) =>
        val better = score > bestScore
        (when(better, score).otherwise(bestScore),
         when(better, lit(lang)).otherwise(bestLang))
    }._2
    (scores, guess)
  }

  /** PII patterns for the scrubbing step of a training-data pipeline:
    * (name, regex, replacement token). The regexes stay inside the
    * portable subset shared by Java regex (Spark codegen'd
    * `regexp_count`/`regexp_replace`) and RE2 (the DuckDB oracle):
    * char classes, bounded quantifiers, `\b` — no backreferences, no
    * lookaround — so detection and redaction are engine-exact. Order
    * matters for redaction and is part of the contract: email first
    * (its local part may contain digits/dots that the later numeric
    * patterns could nibble), then SSN before phone (3-2-4 vs 3-3-4
    * groupings are disjoint, but fixing the order makes that
    * non-reliance explicit), IPv4 last. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IPV4>"))

  /** One non-overlapping match count per PII category — pure
    * `regexp_count` projections: codegen'd, shuffle-free, scan-speed at
    * any corpus size. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, re, _) =>
      name -> regexp_count(text, lit(re)) }

  /** Redacted text: every PII match replaced by its category token, in
    * [[piiPatterns]] order. A fold of codegen'd `regexp_replace` calls
    * — still one projection, no shuffle. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, re, tok)) =>
      regexp_replace(acc, lit(re), lit(tok)) }

  /** Luhn checksum validation of a digit string (ISO/IEC 7812 — the
    * check every serious card-number detector runs to kill the false
    * positives a bare \d{13,16} regex drowns in). Pure higher-order
    * array fold — from the right, double every second digit, subtract
    * 9 past 9, sum ≡ 0 (mod 10). Integer math end to end, codegen'd,
    * no UDF; non-digit or empty input is invalid (never an error), so
    * the expression is safe directly over regex captures. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val chars = split(rev, "")
    // greatest() guards the empty string: sequence(0, -1) would count
    // DOWN and index element_at(chars, 0), which throws
    val total = aggregate(
      sequence(lit(0), greatest(length(rev) - 1, lit(0))),
      lit(0),
      (acc, i) => {
        val d = element_at(chars, i + 1).cast("int")
        val dbl = when(i % 2 === 1, d * 2).otherwise(d)
        acc + when(dbl > 9, dbl - 9).otherwise(dbl)
      })
    length(digits) >= 13 && length(digits) <= 19 &&
      digits.rlike("^[0-9]+$") && total % 10 === 0
  }

  /** Overlapping token-window chunking — the context-window prep step
    * of an LLM training pipeline: each document becomes
    * `max(1, ceil((n − overlap) / step))` chunks of up to `chunkSize`
    * tokens, consecutive chunks sharing `overlap` tokens
    * (`step = chunkSize − overlap`). The last chunk is short iff the
    * document doesn't fill it; documents shorter than one chunk yield
    * exactly one chunk. Pure built-in expressions (tokenize once,
    * `sequence` + `explode` + `slice`) — codegen'd, shuffle-free, and
    * embarrassingly parallel: output ≈ n/step rows per doc regardless
    * of corpus size, so the operator scales with the scan. Chunk ids
    * (`doc_id`, `chunk_idx`) are a pure function of the document —
    * deterministic under any partitioning, and stable across epochs
    * for incremental re-chunking. */
  def chunks(
      docs: org.apache.spark.sql.DataFrame, textCol: String, idCol: String,
      chunkSize: Int = 64, overlap: Int = 16): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0),
          greatest(lit(0),
            ceil((col("n") - lit(overlap)).cast("double") / lit(step))
              .cast("int") - 1))).as("chunk_idx"))
      .withColumn("start", col("chunk_idx") * step)
      .withColumn("n_tokens", least(col("n") - col("start"), lit(chunkSize)))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("w"), col("start") + 1, col("n_tokens")))
          .as("chunk_text"),
        col("n_tokens"))
  }

  /** T5-STYLE SPAN CORRUPTION (Raffel et al., the denoising-objective
    * preprocessor): mask contiguous token spans and emit the
    * (corrupted, target) pair — corrupted replaces each span with one
    * numbered sentinel `<extra_id_k>`, target lists each sentinel
    * followed by the tokens it hid. Span selection is a SEEDED PURE
    * HASH, not rand(): position i starts a span iff the first 4 hex
    * chars of md5("<doc_id>:<i>:<seed>") fall below `pStartHex`, and a
    * span covers `spanLen` tokens — so the draw is reproducible under
    * any partitioning/replay AND replayable in SQL (the md5-draw
    * oracle pattern q_bloom_exact / q_dedup_stream_parity use).
    * Overlapping draws merge into one span (position j is masked iff
    * any of the `spanLen` positions ending at j drew a start; a span
    * BEGINS where a masked run begins), so sentinel numbering is
    * dense 0..n_spans−1 in document order.
    *
    * Partition-local kernel: one MD5 + one O(tokens) sweep per doc, no
    * shuffle before the output sort — the mask is a scan-shaped
    * projection at any corpus size. */
  def spanCorrupt(docs: DataFrame, textCol: String, idCol: String,
      seed: Long, pStartHex: String = "2000", spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1, s"spanLen=$spanLen")
    require(pStartHex.length == 4 &&
      pStartHex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"pStartHex must be 4 lowercase hex chars, got '$pStartHex'")
    val spark = docs.sparkSession
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      tokens(col(textCol)).as("ts"))
    val scored = toks.rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def draw(id: Long, i: Int): Boolean = {
        val h = md.digest(s"$id:$i:$seed"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 4 hex chars = first 2 bytes
        val hex = f"${(h(0) & 0xff)}%02x${(h(1) & 0xff)}%02x"
        hex < pStartHex
      }
      it.map { row =>
        val id = row.getLong(0)
        val ts = row.getSeq[String](1)
        val n = if (ts == null) 0 else ts.length
        val starts = Array.tabulate(n)(i => draw(id, i))
        val corrupted = new StringBuilder
        val target = new StringBuilder
        var nSpans = 0L
        var nMasked = 0L
        var inSpan = false
        var j = 0
        while (j < n) {
          var masked = false
          var i = math.max(0, j - spanLen + 1)
          while (i <= j && !masked) { masked = starts(i); i += 1 }
          if (masked) {
            nMasked += 1
            if (!inSpan) {
              val k = nSpans
              nSpans += 1
              if (corrupted.nonEmpty) corrupted.append(' ')
              corrupted.append(s"<extra_id_$k>")
              if (target.nonEmpty) target.append(' ')
              target.append(s"<extra_id_$k>")
            }
            target.append(' ').append(ts(j))
            inSpan = true
          } else {
            if (corrupted.nonEmpty) corrupted.append(' ')
            corrupted.append(ts(j))
            inSpan = false
          }
          j += 1
        }
        org.apache.spark.sql.Row(id, n.toLong, nSpans, nMasked,
          corrupted.toString, target.toString)
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(scored, StructType(Seq(
      StructField("doc_id", LongType, false),
      StructField("n_tokens", LongType, false),
      StructField("n_spans", LongType, false),
      StructField("n_masked", LongType, false),
      StructField("corrupted", StringType, false),
      StructField("target", StringType, false))))
  }
}
