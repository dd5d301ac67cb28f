package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Statistical-LM document quality scoring (round-11) — the
  * CCNet/Gopher-style perplexity filter: score each document by the
  * average negative log-probability of its word bigrams under an
  * add-α bigram model trained on the corpus itself. Fluent,
  * corpus-typical text scores low; token soup, boilerplate, and
  * wrong-language fragments score high — the standard third axis next
  * to the rule-based quality metrics (`Text` ratios) and the
  * repetition filters.
  *
  * Fully declarative (the tfidf posture, no driver-side model state):
  *   1. bigram census — one partial-agg exchange whose OUTPUT is
  *      bounded by vocab², never corpus-sized;
  *   2. context totals + vocabulary size — derived from the census
  *      (no extra corpus scan) plus one distinct-count;
  *   3. the model (bigram → cost) joins back via broadcast and each
  *      document's score is one (doc, bigram)-pair aggregation — the
  *      same single exchange shape as tf-idf.
  * At an open-vocabulary 100 TB corpus the census is pruned to top-K
  * bigrams + an UNK fallback before broadcasting — implemented as
  * [[lmScoresTopK]] (round-12) and gated by `q_text_lm_score_topk`
  * with the pruned census + UNK costs replayed exactly in the oracle;
  * the full-census [[lmScores]] remains the closed-vocabulary gate.
  *
  * Numeric rule 5b: per-bigram costs −ln((c12+α)/(c1+α·V)) are
  * quantized to DECIMAL(18,9) in both engines (libm ln drifts 1 ULP
  * between DuckDB and the JVM), summed exactly as decimals, and only
  * the final per-doc mean returns to double.
  */
object LangModel {

  /** α = 1/2 add-α smoothing: 0.5·V and c+0.5 are exact in binary
    * floating point, so the pre-ln rational is bit-identical across
    * engines. */
  private val Alpha = 0.5

  /** (bigram, w1, c12) census over the corpus — output ≤ vocab². */
  def bigramCensus(docs: DataFrame, textCol: Column, idCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"),
      explode(Text.ngramsAll(Text.tokens(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))

  /** COLLOCATION MINING (round-13): top-k bigrams by normalized PMI
    * (Bouma 2009 — the phrase-mining score; NPMI = PMI / −ln p(xy) ∈
    * [−1, 1], length-bias-corrected so rare-but-perfect collocations
    * don't drown frequent ones). Probabilities are exact rationals
    * over the bigram-occurrence total N: both log arguments are
    * products/quotients of longs exact in double (< 2^53), the two
    * lns quantize to DECIMAL(18,9) (rule 5b), and the final ratio
    * divides the two hopped doubles — correctly rounded, engine-
    * identical. `minCount` keeps the singleton tail out of the board.
    *
    * Scale shape: the bigram census is one partial-agg exchange
    * (vocab²-bounded output), the left/right marginals two more
    * vocab-sized aggs, the one-row N broadcast, and the board a
    * TakeOrdered(k) — occurrence rows never shuffle twice. */
  def collocations(docs: DataFrame, textCol: Column, idCol: Column,
                   minCount: Int = 5, k: Int = 30): DataFrame = {
    // census on (w1, w2) token pairs — the bigram STRING concatenates
    // only on census rows (≤ vocab²), never per occurrence; the
    // string-per-occurrence explode is the 6× slower shape
    // q_text_lm_score's kernel note documents
    val t = Text.tokens(textCol)
    val bi = docs.select(t.as("t")).filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val lx = bi.groupBy(col("w1")).agg(sum(col("c12")).as("cx"))
    val rx = bi.groupBy(col("w2")).agg(sum(col("c12")).as("cy"))
    val nn = bi.agg(sum(col("c12")).as("n"))
    val d = (c: Column) => c.cast("double")
    bi.filter(col("c12") >= minCount)
      .join(lx, "w1").join(rx, "w2")
      .crossJoin(broadcast(nn))
      .withColumn("pmi_d",
        log(d(col("c12")) * d(col("n")) / (d(col("cx")) * d(col("cy"))))
          .cast("decimal(18,9)"))
      .withColumn("den_d",
        log(d(col("n")) / d(col("c12"))).cast("decimal(18,9)"))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"), col("c12"),
        (Similarity.decToDouble(col("pmi_d")) /
          Similarity.decToDouble(col("den_d"))).as("npmi"))
      .orderBy(col("npmi").desc, col("bigram").asc)
      .limit(k)
  }

  /** Per-document LM cost: doc_id, n_bigrams, sum_cost, avg_cost.
    * Documents with fewer than two tokens have no bigrams and are
    * absent (they carry no sequence evidence either way — route them
    * to the rule-based quality gate instead). */
  /** Default path: a two-pass KERNEL (the Lloyd/PCA exact-partials
    * posture — measured 8.6 → ~1.5 s at sf0.1 vs the declarative
    * explode, which remains as [[lmScoresDeclarative]], asserted
    * value-equal in `LangModelSpec`):
    *   pass 1 folds each partition's bigrams into a vocab²-BOUNDED
    *   count map (plus the token set and doc count) — the wire carries
    *   partitions × census partials, never occurrence rows;
    *   pass 2 broadcasts the (bigram → quantized cost) model and sums
    *   each document's exact-decimal cost in place — zero shuffle
    *   before the output sort.
    * The model costs quantize through the shortest-double-string grid
    * (scala `BigDecimal(double)` ≡ DuckDB's VARCHAR hop), and JVM
    * `Math.log` is the same libm Spark's codegen'd `log` calls, so the
    * kernel is value-identical to both the declarative twin and the
    * oracle. */
  def lmScores(docs: DataFrame, textCol: Column, idCol: Column): DataFrame =
    scoreWithModel(docs, textCol, idCol, topK = None)

  /** OPEN-VOCABULARY variant — the 100 TB posture the full-census form
    * cannot take (a web-scale corpus's bigram census is unbounded; a
    * broadcastable model is not): keep only the top-`k` bigrams by
    * count (ties broken by bigram string — deterministic, so the
    * oracle replays the exact same cut), score every other bigram by
    * the UNK fallback — its cost with c12 treated as 0,
    * −ln(α/(c1+α·V)). Context totals c1 and the vocabulary size stay
    * EXACT: they are vocab-sized (affordable at any corpus scale),
    * only the vocab²-sized bigram table is pruned. A bigram whose
    * context w1 was never seen at all costs −ln(α/(α·V)) = ln(V)
    * (unreachable when scoring the training corpus itself, defined for
    * transfer scoring). */
  def lmScoresTopK(docs: DataFrame, textCol: Column, idCol: Column,
      k: Int): DataFrame =
    scoreWithModel(docs, textCol, idCol, topK = Some(k))

  /** The broadcastable scoring state: the bigram→cost model (FULL
    * census under [[lmScores]], ≤ K entries under [[lmScoresTopK]]),
    * the per-context UNK costs (vocab-sized — affordable at any corpus
    * scale), and the vocabulary size. `private[graft]` so the spec can
    * assert the K-bound on the broadcast payload directly. */
  private[graft] case class Model(
      model: java.util.HashMap[String, java.math.BigDecimal],
      unk: java.util.HashMap[String, java.math.BigDecimal],
      v: Long)

  private[graft] def quantizeCost(cost: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(cost))
      .setScale(9, java.math.RoundingMode.HALF_UP)

  /** Build the broadcast model. Under `topK = Some(k)` everything
    * driver-sided is bounded: the census stays DISTRIBUTED (the
    * [[bigramCensus]] groupBy) and only three bounded artifacts are
    * collected — the K survivors of the (count desc, bigram asc) cut,
    * the vocab-sized context totals, and the vocabulary count. Pruned
    * bigrams are NOT materialized anywhere (not on the driver, not in
    * the broadcast): pass 2's per-context UNK fallback scores them to
    * the identical value −ln(α/(c1+α·V)), so dropping them is a pure
    * size win. Tie order at the K boundary is Spark's UTF8String
    * binary comparison = UTF-8 byte order = Unicode code-point order —
    * the same collation DuckDB's ORDER BY bigram uses, so the cut is
    * engine-portable even on supplementary-plane tokens (ADVICE r12).
    * Under `topK = None` the full census IS the model; that path is
    * the closed-vocabulary form and keeps the single-scan RDD kernel
    * (one exchange-free partial-agg pass). */
  private[graft] def buildModel(docs: DataFrame, textCol: Column,
      topK: Option[Int]): Model = {
    import java.math.{BigDecimal => JBD}
    val toks = docs.select(Text.tokens(textCol).as("ts"))
    topK match {
      case Some(k) =>
        // open-vocabulary path: the census never leaves the cluster
        val census = toks
          .select(explode(Text.ngramsAll(col("ts"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
          .withColumn("w1", substring_index(col("bigram"), " ", 1))
          .checkpointLinted() // one census scan feeds cut + totals
        // vocab-sized context totals; collected map ∝ vocab, never vocab²
        val c1 = new java.util.HashMap[String, Long]()
        census.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
          .collect().foreach(r => c1.put(r.getString(0), r.getLong(1)))
        val v = toks.select(explode(col("ts")).as("t"))
          .agg(countDistinct(col("t"))).head().getLong(0)
        val model = new java.util.HashMap[String, JBD]()
        // the cut runs as a distributed TakeOrdered (top-k per
        // partition, merge of k-sized partials) — K rows reach the
        // driver, not the census
        census.orderBy(col("c12").desc, col("bigram").asc).limit(k)
          .select(col("bigram"), col("c12"), col("w1")).collect()
          .foreach { r =>
            val cost = -math.log((r.getLong(1) + Alpha) /
              (c1.get(r.getString(2)) + Alpha * v))
            model.put(r.getString(0), quantizeCost(cost))
          }
        val unk = new java.util.HashMap[String, JBD]()
        c1.forEach { (w1, c) =>
          unk.put(w1, quantizeCost(-math.log(Alpha / (c + Alpha * v))))
        }
        Model(model, unk, v)
      case None =>
        // closed-vocabulary path: single-scan RDD kernel; census
        // partials are vocab²-bounded and merge on the driver (the
        // documented full-census contract of lmScores)
        val partials = toks.rdd.mapPartitions { it =>
          val bi = new java.util.HashMap[String, Long]()
          val vocab = new java.util.HashSet[String]()
          it.foreach { row =>
            val ts = row.getSeq[String](0)
            if (ts != null) {
              var i = 0
              while (i < ts.length) {
                vocab.add(ts(i))
                if (i + 1 < ts.length) {
                  val b = ts(i) + " " + ts(i + 1)
                  bi.merge(b, 1L, (a, x) => a + x)
                }
                i += 1
              }
            }
          }
          Iterator.single((bi, vocab))
        }.collect()
        val biCounts = new java.util.HashMap[String, Long]()
        val vocabSet = new java.util.HashSet[String]()
        partials.foreach { case (bi, vo) =>
          bi.forEach((k2, v2) => biCounts.merge(k2, v2, (a, x) => a + x))
          vocabSet.addAll(vo)
        }
        val v = vocabSet.size.toLong
        val c1 = new java.util.HashMap[String, Long]()
        biCounts.forEach { (b, c) =>
          c1.merge(b.substring(0, b.indexOf(' ')), c, (a, x) => a + x)
        }
        val model = new java.util.HashMap[String, JBD]()
        biCounts.forEach { (b, c12) =>
          val cost = -math.log((c12 + Alpha) /
            (c1.get(b.substring(0, b.indexOf(' '))) + Alpha * v))
          model.put(b, quantizeCost(cost))
        }
        val unk = new java.util.HashMap[String, JBD]()
        c1.forEach { (w1, c) =>
          unk.put(w1, quantizeCost(-math.log(Alpha / (c + Alpha * v))))
        }
        Model(model, unk, v)
    }
  }

  private def scoreWithModel(docs: DataFrame, textCol: Column,
      idCol: Column, topK: Option[Int]): DataFrame =
    scoreKernel(docs, textCol, idCol, buildModel(docs, textCol, topK),
      exactModel = topK.isEmpty)

  /** The shared pass-2 KERNEL: broadcast the (bigram → cost) and
    * per-context UNK maps and fold each document's exact-decimal sum
    * in place — no shuffle before the output sort. The declarative
    * join form of the same scoring ran 8.5 s at sf0.1 (SCALE.md LM
    * row); this runs it in ~0.7 s, and the persisted-index path
    * ([[lmScoresIndexed]]) reuses it instead of re-deriving the slow
    * shape. `exactModel` = fail loud on a model miss (self-corpus
    * full-census contract); false = cross-corpus, take the UNK ladder. */
  private[graft] def scoreKernel(docs: DataFrame, textCol: Column,
      idCol: Column, built: Model, exactModel: Boolean): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = docs.sparkSession
    val toks = docs.select(idCol.cast("long").as("doc_id"),
      Text.tokens(textCol).as("ts"))

    val v = built.v
    val unkFloor = quantizeCost(math.log(v.toDouble.max(1.0)))
    val bcModel = spark.sparkContext.broadcast(built.model)
    val bcUnk = spark.sparkContext.broadcast(built.unk)

    // pass 2: per-doc exact-decimal occurrence sums, no shuffle
    val scored = toks.rdd.mapPartitions { it =>
      val m = bcModel.value
      val u = bcUnk.value
      it.flatMap { row =>
        val id = row.getLong(0)
        val ts = row.getSeq[String](1)
        if (ts == null || ts.length < 2) Iterator.empty
        else {
          var sum = JBD.ZERO
          var n = 0L
          var i = 0
          while (i + 1 < ts.length) {
            val b = ts(i) + " " + ts(i + 1)
            var cost = m.get(b)
            if (cost == null) {
              // under the EXACT model every scored bigram was censused
              // in pass 1 — a miss means the source re-evaluated
              // non-deterministically between the two scans; scoring
              // it as UNK would silently corrupt values, so fail loud
              if (exactModel) throw new IllegalStateException(
                s"bigram '$b' absent from the pass-1 census: the input " +
                  "DataFrame must be deterministic across lmScores's two scans")
              val uc = u.get(ts(i))
              cost = if (uc != null) uc else unkFloor
            }
            sum = sum.add(cost)
            n += 1; i += 1
          }
          Iterator.single(org.apache.spark.sql.Row(id, n,
            sum.setScale(9, RoundingMode.UNNECESSARY)))
        }
      }
    }
    spark.createDataFrame(scored,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("n_bigrams",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("sum_d",
          org.apache.spark.sql.types.DecimalType(28, 9), false))))
      .select(col("doc_id"), col("n_bigrams"),
        Similarity.decToDouble(col("sum_d")).as("sum_cost"),
        (Similarity.decToDouble(col("sum_d")) / col("n_bigrams"))
          .as("avg_cost"))
  }

  /** The declarative one-explode-pass form — the kernel's value-equal
    * twin (and the shape the oracle replays). */
  def lmScoresDeclarative(docs: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val docBi = docs.select(idCol.as("doc_id"),
      explode(Text.ngramsAll(Text.tokens(textCol), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
      .checkpointLinted()
    val bi = docBi.groupBy(col("bigram")).agg(sum(col("c")).as("c12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val uni = bi.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(Text.tokens(textCol)).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val model = bi.join(uni, "w1").crossJoin(broadcast(vocab))
      .withColumn("cost_d",
        (-log((col("c12") + lit(Alpha)) / (col("c1") + lit(Alpha) * col("v"))))
          .cast("decimal(18,9)"))
      .select(col("bigram"), col("cost_d"))
    // Σ over occurrences of cost ≡ Σ c·cost — decimal products are
    // exact, so the collapsed form is value-identical to the oracle's
    // occurrence-level sum
    docBi.join(broadcast(model), "bigram")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        // c capped to decimal(10,0) keeps the product at (29,9) — a
        // raw long operand would push precision past 38 and Spark's
        // allowPrecisionLoss would silently ROUND the scale away
        sum(col("c").cast("decimal(10,0)") * col("cost_d"))
          .cast("decimal(28,9)").as("sum_d"))
      .select(col("doc_id"), col("n_bigrams"),
        Similarity.decToDouble(col("sum_d")).as("sum_cost"),
        (Similarity.decToDouble(col("sum_d")) / col("n_bigrams"))
          .as("avg_cost"))
  }

  /** PERSISTED MODEL — the production posture for LM filtering (and
    * [[Dsir]]) at corpus scale: train ONCE per epoch, persist the
    * quantized cost tables, score any later batch against the index
    * without retraining — the same persisted-index contract as the
    * ANN/dedup/phash indexes. Layout:
    *   `path/model` — (bigram, cost_d DECIMAL(18,9)): full census, or
    *     the top-`topK` cut (count desc, bigram asc — the engine-
    *     portable collation) under the open-vocabulary posture;
    *   `path/unk`   — (w1, unk_d): per-context UNK costs, vocab-sized;
    *   `path/meta`  — (v, k): vocabulary size + the cut (−1 = full).
    * Everything is declarative: census partial-agg, TakeOrdered cut,
    * cost projection — no driver-side model state at all. */
  def writeLmModel(docs: DataFrame, textCol: Column, path: String,
      topK: Option[Int] = None): Unit = {
    val toks = docs.select(Text.tokens(textCol).as("ts"))
    writeModelTree(docs.sparkSession,
      toks.select(explode(Text.ngramsAll(col("ts"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("c12")),
      toks.select(explode(col("ts")).as("tok")).distinct(),
      topK, path)
  }

  /** INCREMENTAL model maintenance -- fold a new document batch into a
    * persisted model WITHOUT rescanning the prior corpus: the index
    * stores its census and vocabulary (data-scale parquet, never
    * collected), so appending is batch census + stored census merged
    * by one bounded partial-agg, vocab unioned, and every cost
    * recomputed from the merged counts. The cut policy (`meta.k`)
    * travels with the index -- the top-K re-cuts over the MERGED
    * census, so an appended model is bit-identical to a one-shot
    * build of the combined corpus (asserted in `LangModelSpec` and
    * gated by q_text_lm_incremental against the one-shot oracle).
    * Commit is the staged-tree swap; a crashed append leaves the
    * prior index intact and replays from scratch. */
  def appendLmModel(batch: DataFrame, textCol: Column, path: String): Unit = {
    val spark = batch.sparkSession
    graft.io.Fs.recoverAside(spark, path)
    val k = spark.read.parquet(s"$path/meta").head().getInt(1)
    val topK = if (k < 0) None else Some(k)
    val toks = batch.select(Text.tokens(textCol).as("ts"))
    val merged = spark.read.parquet(s"$path/census")
      .select(col("bigram"), col("c12"))
      .unionByName(
        toks.select(explode(Text.ngramsAll(col("ts"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("c12")))
      .groupBy(col("bigram")).agg(sum(col("c12")).as("c12"))
    val vocab = spark.read.parquet(s"$path/vocab")
      .unionByName(toks.select(explode(col("ts")).as("tok")))
      .distinct()
    writeModelTree(spark, merged, vocab, topK, path)
  }

  /** Build the full index tree (census, vocab, model, unk, meta) into
    * a staging sibling, then swap it in with ONE
    * [[graft.io.Fs.replaceDir]] -- readers never see a half-written
    * index and a crashed build leaves the prior tree intact (the
    * mid-swap aside is repaired by [[graft.io.Fs.recoverAside]] on
    * the next read/append). The census/vocab inputs may lazily READ
    * the live tree (the append path): they are materialized into
    * staging FIRST, and every later projection reads staging, so the
    * final swap never invalidates an open lineage. */
  private def writeModelTree(spark: org.apache.spark.sql.SparkSession,
      census0: DataFrame, vocab0: DataFrame, topK: Option[Int],
      path: String): Unit = {
    import spark.implicits._
    val staging = s"$path.staging"
    graft.io.Fs.deleteRecursive(spark, staging)
    census0.withColumn("w1", substring_index(col("bigram"), " ", 1))
      .write.parquet(s"$staging/census")
    vocab0.write.parquet(s"$staging/vocab")
    val census = spark.read.parquet(s"$staging/census")
    val uni = census.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      .checkpointLinted() // vocab-sized; feeds model + unk
    val v = spark.read.parquet(s"$staging/vocab").count()
    val kept = topK match {
      case Some(k) =>
        census.orderBy(col("c12").desc, col("bigram").asc).limit(k)
      case None => census
    }
    // the same double expression + double->decimal quantization the
    // kernel and declarative twins use -- value-identical costs;
    // uni is vocab-sized -> broadcast, the census never shuffles again
    kept.join(broadcast(uni), "w1")
      .select(col("bigram"),
        (-log((col("c12") + lit(Alpha)) /
          (col("c1") + lit(Alpha) * lit(v.toDouble))))
          .cast("decimal(18,9)").as("cost_d"))
      .write.parquet(s"$staging/model")
    uni.select(col("w1"),
        (-log(lit(Alpha) / (col("c1") + lit(Alpha) * lit(v.toDouble))))
          .cast("decimal(18,9)").as("unk_d"))
      .write.parquet(s"$staging/unk")
    Seq((v, topK.getOrElse(-1))).toDF("v", "k")
      .write.parquet(s"$staging/meta")
    graft.io.Fs.replaceDir(spark, staging, path)
  }

  /** Rehydrate a persisted model ([[writeLmModel]]) into the broadcast
    * [[Model]] shape the scoring kernel consumes. The collected maps
    * are ≤ K + vocab entries under the topK posture — the same bound
    * the in-memory path broadcasts; a full-census model of an
    * open-vocabulary corpus should be written with topK. */
  private[graft] def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Model = {
    import java.math.{BigDecimal => JBD}
    graft.io.Fs.recoverAside(spark, path) // crashed mid-swap append
    val model = new java.util.HashMap[String, JBD]()
    spark.read.parquet(s"$path/model").collect()
      .foreach(r => model.put(r.getString(0), r.getDecimal(1)))
    val unk = new java.util.HashMap[String, JBD]()
    spark.read.parquet(s"$path/unk").collect()
      .foreach(r => unk.put(r.getString(0), r.getDecimal(1)))
    val v = spark.read.parquet(s"$path/meta").head().getLong(0)
    Model(model, unk, v)
  }

  /** Score documents against a persisted model ([[writeLmModel]]) —
    * the pass-2 kernel over the rehydrated broadcast maps; the corpus
    * never shuffles and the model is never rebuilt. Cross-corpus
    * scoring is first-class: unseen bigrams take the UNK ladder. */
  def lmScoresIndexed(docs: DataFrame, textCol: Column, idCol: Column,
      path: String): DataFrame =
    scoreKernel(docs, textCol, idCol,
      loadModel(docs.sparkSession, path), exactModel = false)
}
