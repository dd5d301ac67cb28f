package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer training (Sennrich et al. 2016,
  * subword-nmt semantics): learn K byte-pair merges from a
  * word-frequency census and encode the corpus by replaying the
  * merges in rank order.
  *
  * Reference anchor: the reference pipeline tokenizes text columns
  * before loading marts (dags/dag_etl_minio_to_postgres.py:188-214
  * string standardization); BPE is the training-data-pipeline
  * extension of that surface — the tokenizer every LLM corpus build
  * trains before packing.
  *
  * Scale shape — the census posture applied to tokenizer training:
  *   - CENSUS (the only corpus-scale stage): one scan, explode words,
  *     hash-aggregate to (word, freq). At 100 TB this is the same
  *     shuffle as q_text_vocab; everything downstream is bounded by
  *     the distinct-word table, never the corpus.
  *   - TRAIN: the merge loop runs on the top-V capped census
  *     (V·avg_len cells — MBs at any corpus size; capping the
  *     training vocabulary is standard BPE practice, not a shortcut).
  *     Each round counts adjacent pairs (overlapping included,
  *     weighted by word freq), picks argmax by (count desc, pair asc
  *     in code-point order), and fuses greedy-leftmost. Driver-side
  *     by design: the data is metadata-sized after the cap, exactly
  *     like the d²-bounded PCA/QualityModel iterations.
  *   - ENCODE (corpus-scale again): merges broadcast as a K-entry
  *     list; each distinct word replays them in rank order (Sennrich
  *     apply_bpe), then token counts aggregate weighted by word freq.
  *     Corpus text is scanned once; the merge replay runs on the
  *     distinct-word table.
  *
  * Cross-engine exactness: the DuckDB oracle re-derives the merges
  * independently — K unrolled CTE rounds emitted by the same
  * constants, each round = lead() adjacency census, LIMIT 1 argmax,
  * and a window-function greedy fuse (runs of overlapping matches
  * keep odd offsets, which equals the sequential leftmost scan).
  * Every multi-referenced CTE is MATERIALIZED so evaluation stays
  * linear in K. Tie order is code-point order on both sides (Spark
  * UTF8String binary sort = DuckDB UTF-8 binary collation; the
  * driver comparator walks code points, not UTF-16 units).
  */
object Bpe {

  val Merges = 40
  val VocabCap = 2048
  val TopTokens = 256

  final case class Merge(rank: Int, lhs: String, rhs: String,
                         merged: String, cnt: Long)

  /** Corpus word census: (word, freq), empty words dropped — the
    * same whitespace tokenizer as the rest of the text family. */
  def wordCensus(docs: DataFrame): DataFrame =
    docs.select(explode(Text.tokens(col("text"))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))

  /** Code-point split (NOT UTF-16 chars: a supplementary-plane
    * symbol is one token, matching DuckDB's regexp '.'). */
  def codePointSplit(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Code-point lexicographic compare = UTF-8 byte order = DuckDB's
    * binary collation (Java String.compareTo is UTF-16 order, which
    * diverges on supplementary-plane symbols). */
  def cpCompare(x: String, y: String): Int = {
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val a = x.codePointAt(i); val b = y.codePointAt(j)
      if (a != b) return Integer.compare(a, b)
      i += Character.charCount(a); j += Character.charCount(b)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Greedy leftmost non-overlapping fuse of (a,b): scan once; a
    * match consumes both tokens (so in a run like "aaa" the first
    * pair wins and the middle token cannot re-match). */
  def fuse(toks: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** The merge loop over a collected (tokens, freq) table. Adjacent
    * pairs count per occurrence (overlapping included), weighted by
    * freq; argmax by (count desc, lhs asc, rhs asc) in code-point
    * order; stops early when no pairs remain. */
  def trainMerges(words: Array[(Array[String], Long)], k: Int): Array[Merge] = {
    val state = words.map { case (t, f) => (t.clone(), f) }
    val merges = Array.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      state.foreach { case (t, f) =>
        var i = 0
        while (i + 1 < t.length) {
          counts.merge((t(i), t(i + 1)), f, (x, y) => x + y); i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && {
                val ca = cpCompare(p._1, best._1._1)
                ca < 0 || (ca == 0 && cpCompare(p._2, best._1._2) < 0)
              })) best = (p, c)
        }
        val ((a, b), c) = best
        merges += Merge(r, a, b, a + b, c)
        var i = 0
        while (i < state.length) {
          val (t, f) = state(i)
          // cheap containment pre-check before allocating the fuse
          var hit = false; var j = 0
          while (!hit && j + 1 < t.length) {
            hit = t(j) == a && t(j + 1) == b; j += 1
          }
          if (hit) state(i) = (fuse(t, a, b), f)
          i += 1
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Train on the top-`cap` census rows (count desc, word asc — the
    * deterministic cap both engines apply). */
  def train(docs: DataFrame, k: Int = Merges, cap: Int = VocabCap): Array[Merge] = {
    val vocab = wordCensus(docs)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(cap)
      .collect()
      .map(r => (codePointSplit(r.getString(0)), r.getLong(1)))
    trainMerges(vocab, k)
  }

  /** Sennrich apply_bpe: replay the merges in rank order over one
    * word's code points. */
  def applyMerges(w: String, merges: Array[Merge]): Array[String] = {
    var t = codePointSplit(w)
    var i = 0
    while (i < merges.length) {
      val m = merges(i)
      // containment pre-check: most merges never touch most words
      var hit = false; var j = 0
      while (!hit && j + 1 < t.length) {
        hit = t(j) == m.lhs && t(j + 1) == m.rhs; j += 1
      }
      if (hit) t = fuse(t, m.lhs, m.rhs)
      i += 1
    }
    t
  }

  /** Merge table as a DataFrame (rank, lhs, rhs, merged, cnt). */
  def mergesFrame(spark: SparkSession, docs: DataFrame,
                  k: Int = Merges, cap: Int = VocabCap): DataFrame = {
    val rows = train(docs, k, cap)
      .map(m => Row(m.rank, m.lhs, m.rhs, m.merged, m.cnt))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("rank", IntegerType, false),
        StructField("lhs", StringType, false),
        StructField("rhs", StringType, false),
        StructField("merged", StringType, false),
        StructField("cnt", LongType, false))))
  }

  /** Corpus token frequencies under the trained tokenizer: the merge
    * replay runs distributed over the DISTINCT-WORD table (merges
    * ride a broadcast; the corpus is scanned once by the census). */
  def tokenFrequencies(docs: DataFrame, k: Int = Merges,
                       cap: Int = VocabCap, top: Int = TopTokens): DataFrame =
    tokenFrequenciesWith(docs, train(docs, k, cap), top)

  /** Persist the tokenizer as a parquet artifact tree — the epoch
    * posture: train once, encode every later batch without
    * re-deriving the merges. Layout:
    *   `path/census` — the FULL word-frequency census (word, freq):
    *     the sufficient statistic that makes [[appendBpeModel]]
    *     possible without rescanning the prior corpus;
    *   `path/merges` — the rank-ordered merge table;
    *   `path/meta`   — (k, cap), so the training policy travels with
    *     the artifact.
    * Commit is the staged-tree swap ([[graft.io.Fs.replaceDir]]); a
    * crashed build leaves the prior tree intact. */
  def writeBpeModel(spark: SparkSession, docs: DataFrame, path: String,
                    k: Int = Merges, cap: Int = VocabCap): Unit =
    writeTree(spark, wordCensus(docs), k, cap, path)

  /** INCREMENTAL tokenizer maintenance — fold a new document batch
    * into a persisted tokenizer WITHOUT rescanning the prior corpus:
    * word counts are associative, so batch census + stored census is
    * the combined-corpus census exactly, and retraining over the
    * re-capped merged census is bit-identical to a one-shot build
    * (gated by q_text_bpe_incremental against the one-shot oracle). */
  def appendBpeModel(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    graft.io.Fs.recoverAside(spark, path)
    val meta = spark.read.parquet(s"$path/meta").head()
    val merged = spark.read.parquet(s"$path/census")
      .unionByName(wordCensus(batch))
      .groupBy(col("word")).agg(sum(col("freq")).as("freq"))
    writeTree(spark, merged, meta.getInt(0), meta.getInt(1), path)
  }

  private def writeTree(spark: SparkSession, census0: DataFrame,
                        k: Int, cap: Int, path: String): Unit = {
    import spark.implicits._
    val staging = s"$path.staging"
    graft.io.Fs.deleteRecursive(spark, staging)
    // materialize the census FIRST: the append path's census lazily
    // reads the live tree, and the final swap must not invalidate an
    // open lineage
    census0.select(col("word"), col("freq").cast("long").as("freq"))
      .write.parquet(s"$staging/census")
    val vocab = spark.read.parquet(s"$staging/census")
      .orderBy(col("freq").desc, col("word").asc).limit(cap)
      .collect()
      .map(r => (codePointSplit(r.getString(0)), r.getLong(1)))
    val merges = trainMerges(vocab, k)
    val rows = merges.map(m => Row(m.rank, m.lhs, m.rhs, m.merged, m.cnt))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1),
        StructType(Seq(
          StructField("rank", IntegerType, false),
          StructField("lhs", StringType, false),
          StructField("rhs", StringType, false),
          StructField("merged", StringType, false),
          StructField("cnt", LongType, false))))
      .write.parquet(s"$staging/merges")
    Seq((k, cap)).toDF("k", "cap").coalesce(1)
      .write.parquet(s"$staging/meta")
    graft.io.Fs.replaceDir(spark, staging, path)
  }

  /** Reload a persisted merge table in rank order. */
  def loadMerges(spark: SparkSession, path: String): Array[Merge] = {
    graft.io.Fs.recoverAside(spark, path)
    spark.read.parquet(s"$path/merges").orderBy(col("rank")).collect()
      .map(r => Merge(r.getInt(r.fieldIndex("rank")),
        r.getString(r.fieldIndex("lhs")), r.getString(r.fieldIndex("rhs")),
        r.getString(r.fieldIndex("merged")), r.getLong(r.fieldIndex("cnt"))))
  }

  /** Encode from a persisted tokenizer — identical plan to
    * [[tokenFrequencies]], zero training work. */
  def tokenFrequenciesIndexed(docs: DataFrame, modelPath: String,
                              top: Int = TopTokens): DataFrame =
    tokenFrequenciesWith(docs, loadMerges(docs.sparkSession, modelPath), top)

  /** Token-count PARTIALS (no cut): the streaming leg writes one of
    * these per micro-batch; partials sum associatively, so the
    * re-aggregated union equals a one-shot encode of the union
    * corpus. */
  def tokenPartialsWith(docs: DataFrame, merges: Array[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    wordCensus(docs)
      .as[(String, Long)]
      .flatMap { case (w, f) => applyMerges(w, bc.value).map(t => (t, f)) }
      .toDF("token", "wfreq")
      .groupBy("token").agg(sum("wfreq").as("cnt"))
  }

  private def tokenFrequenciesWith(docs: DataFrame, merges: Array[Merge],
                                   top: Int): DataFrame =
    tokenPartialsWith(docs, merges)
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(top)

  // ---------------------------------------------------------------
  // Generated DuckDB oracle — the same constants emit K unrolled
  // rounds that re-derive the merges independently.
  // ---------------------------------------------------------------

  /** Census + per-round (adjacency, argmax, greedy-fuse) CTEs shared
    * by both oracles. State s_r holds every distinct word as
    * (word, freq, inv, pos, tok); pair counting reads only the
    * capped-vocab rows (inv), fusion rewrites all rows. */
  private def oracleBody(table: String, k: Int, cap: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""c$r AS MATERIALIZED (
           SELECT word, freq, inv, pos, tok,
             lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
           FROM s${r - 1}),
         b$r AS MATERIALIZED (
           SELECT tok AS a, nxt AS b, CAST(sum(freq) AS BIGINT) AS cnt
           FROM c$r WHERE inv AND nxt IS NOT NULL
           GROUP BY 1, 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         k$r AS MATERIALIZED (
           SELECT word, pos FROM (
             SELECT word, pos,
               row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
             FROM (SELECT c.word, c.pos,
                     c.pos - row_number()
                       OVER (PARTITION BY c.word ORDER BY c.pos) AS grp
                   FROM c$r c JOIN b$r ON c.tok = b$r.a AND c.nxt = b$r.b))
           WHERE rn % 2 = 1),
         s$r AS MATERIALIZED (
           SELECT word, freq, inv,
             row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
             CASE WHEN kept THEN tok || nxt ELSE tok END AS tok
           FROM (SELECT c.word, c.freq, c.inv, c.pos, c.tok, c.nxt,
                   ka.pos IS NOT NULL AS kept
                 FROM c$r c
                 LEFT JOIN k$r ka ON ka.word = c.word AND ka.pos = c.pos
                 LEFT JOIN k$r kb ON kb.word = c.word AND kb.pos = c.pos - 1
                 WHERE kb.pos IS NULL))"""
    }.mkString(",\n         ")
    s"""WITH w0 AS MATERIALIZED (
           SELECT word, CAST(count(1) AS BIGINT) AS freq FROM (
             SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
             FROM $table)
           WHERE word <> '' GROUP BY word),
         vcap AS MATERIALIZED (
           SELECT word FROM w0 ORDER BY freq DESC, word ASC LIMIT $cap),
         s0 AS MATERIALIZED (
           SELECT word, freq, inv,
             unnest(range(1, len(arr) + 1)) AS pos,
             unnest(arr) AS tok
           FROM (SELECT word, freq,
                   word IN (SELECT word FROM vcap) AS inv,
                   regexp_extract_all(word, '.') AS arr FROM w0)),
         $rounds"""
  }

  /** Merge-table oracle: rank, lhs, rhs, merged, cnt (a rank whose
    * round found no pairs contributes no row, matching the early
    * stop). */
  def mergesOracleSql(table: String, k: Int = Merges, cap: Int = VocabCap): String =
    oracleBody(table, k, cap) +
      (1 to k).map { r =>
        s"""SELECT $r AS rank, a AS lhs, b AS rhs, a || b AS merged, cnt
            FROM b$r"""
      }.mkString("\n       ", "\n       UNION ALL ", "\n       ORDER BY rank")

  /** Token-frequency oracle: explode the final state weighted by
    * word freq. */
  def tokensOracleSql(table: String, k: Int = Merges, cap: Int = VocabCap,
                      top: Int = TopTokens): String =
    oracleBody(table, k, cap) +
      s"""
       SELECT tok AS token, CAST(sum(freq) AS BIGINT) AS cnt
       FROM s$k GROUP BY tok
       ORDER BY cnt DESC, token ASC LIMIT $top"""

  /** Composable oracle prefix ending in `dl(doc_id, tok)` — per-doc
    * BPE token counts (word occurrences joined to the final state's
    * per-word token count). Callers append their own CTEs + SELECT;
    * the Spark twin is the `wordCensus`+`applyMerges` length join. */
  def docLensOraclePrefix(table: String, k: Int = Merges,
                          cap: Int = VocabCap): String =
    oracleBody(table, k, cap) +
      s""",
       wl AS MATERIALIZED (
         SELECT word, CAST(count(1) AS BIGINT) AS n_tok
         FROM s$k GROUP BY word),
       dl AS MATERIALIZED (
         SELECT d.doc_id, CAST(sum(w.n_tok) AS BIGINT) AS tok
         FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
               FROM $table) d
         JOIN wl w ON w.word = d.word
         GROUP BY d.doc_id)"""
}
