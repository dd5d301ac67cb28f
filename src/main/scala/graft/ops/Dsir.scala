package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", arXiv 2302.03169) —
  * the published technique for selecting raw web data that resembles
  * a target domain: score every document by the log importance ratio
  * log p_target(doc) − log p_raw(doc) under two cheap bag-of-ngrams
  * LMs (here: the add-α bigram models [[LangModel]] already builds),
  * then resample by weight.
  *
  * Spark posture — the whole family is two model builds + ONE scoring
  * scan:
  *   - both models come from [[LangModel.buildModel]]: under the
  *     open-vocabulary `topK` path the census stays distributed and
  *     only K survivors + vocab-sized context totals reach the driver
  *     (the 100 TB form); the full-census path is the exact
  *     closed-vocabulary gate;
  *   - scoring broadcasts both models and folds each document's
  *     bigrams in place — no shuffle before the output sort;
  *   - resampling is top-k by weight: `TakeOrderedAndProject`
  *     (per-partition top-k, k-sized driver merge), never a full sort.
  *
  * Numeric rule 5b: per-bigram costs quantize to DECIMAL(18,9) on the
  * shared shortest-double-string grid, the per-occurrence importance
  * increment is the EXACT decimal difference cost_raw − cost_target,
  * and only the final per-doc sums return to double — so the DuckDB
  * oracle replays every weight bit-for-bit.
  *
  * A scored bigram may be absent from the target model (different
  * corpus or pruned): it scores through the target's per-context UNK
  * cost −ln(α/(c1+α·V_t)), and a context never seen in the target at
  * all costs the floor ln(V_t) — exactly [[LangModel]]'s fallback
  * ladder, replayed in the oracle as coalesce(model, unk, floor). */
object Dsir {

  /** Per-document log importance weights. Output: (doc_id, is_target,
    * n_bigrams, w_sum, w_avg), documents with <2 tokens absent (no
    * bigram evidence — route them to the rule-based quality gate).
    * `topK`: prune BOTH models to their top-K bigrams (the
    * open-vocabulary posture); None = exact full census. */
  def importanceWeights(docs: DataFrame, textCol: Column, idCol: Column,
      isTarget: Column, topK: Option[Int] = None): DataFrame =
    weightKernel(docs, textCol, idCol, isTarget,
      LangModel.buildModel(docs, textCol, topK),
      LangModel.buildModel(docs.filter(isTarget), textCol, topK),
      exactRaw = topK.isEmpty)

  /** The shared weighting KERNEL (the [[LangModel]] pass-2 posture):
    * both models broadcast as maps, each document's exact-decimal
    * weight folds in place — no shuffle before the output sort. The
    * in-memory and persisted-index paths share it, so they are
    * value-identical by construction. */
  private def weightKernel(docs: DataFrame, textCol: Column,
      idCol: Column, isTarget: Column, raw: LangModel.Model,
      tgt: LangModel.Model, exactRaw: Boolean): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val spark = docs.sparkSession
    val rawFloor = LangModel.quantizeCost(math.log(raw.v.toDouble.max(1.0)))
    val tgtFloor = LangModel.quantizeCost(math.log(tgt.v.toDouble.max(1.0)))
    val bcRawM = spark.sparkContext.broadcast(raw.model)
    val bcRawU = spark.sparkContext.broadcast(raw.unk)
    val bcTgtM = spark.sparkContext.broadcast(tgt.model)
    val bcTgtU = spark.sparkContext.broadcast(tgt.unk)

    val toks = docs.select(idCol.cast("long").as("doc_id"),
      isTarget.cast("boolean").as("is_target"),
      Text.tokens(textCol).as("ts"))
    val scored = toks.rdd.mapPartitions { it =>
      val rm = bcRawM.value; val ru = bcRawU.value
      val tm = bcTgtM.value; val tu = bcTgtU.value
      it.flatMap { row =>
        val id = row.getLong(0)
        val isT = row.getBoolean(1)
        val ts = row.getSeq[String](2)
        if (ts == null || ts.length < 2) Iterator.empty
        else {
          var sum = JBD.ZERO
          var n = 0L
          var i = 0
          while (i + 1 < ts.length) {
            val b = ts(i) + " " + ts(i + 1)
            var rc = rm.get(b)
            if (rc == null) {
              // the raw model is trained on the SCORED corpus itself:
              // under the exact census a miss means non-deterministic
              // re-evaluation between the two scans — fail loud, the
              // lmScores contract
              if (exactRaw) throw new IllegalStateException(
                s"bigram '$b' absent from the raw census: the input " +
                  "DataFrame must be deterministic across Dsir's scans")
              val uc = ru.get(ts(i))
              rc = if (uc != null) uc else rawFloor
            }
            var tc = tm.get(b)
            if (tc == null) {
              val uc = tu.get(ts(i))
              tc = if (uc != null) uc else tgtFloor
            }
            sum = sum.add(rc.subtract(tc))
            n += 1; i += 1
          }
          Iterator.single(org.apache.spark.sql.Row(id, isT, n,
            sum.setScale(9, RoundingMode.UNNECESSARY)))
        }
      }
    }
    spark.createDataFrame(scored,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("is_target",
          org.apache.spark.sql.types.BooleanType, false),
        org.apache.spark.sql.types.StructField("n_bigrams",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("w_d",
          org.apache.spark.sql.types.DecimalType(28, 9), false))))
      .select(col("doc_id"), col("is_target"), col("n_bigrams"),
        Similarity.decToDouble(col("w_d")).as("w_sum"),
        (Similarity.decToDouble(col("w_d")) / col("n_bigrams"))
          .as("w_avg"))
  }

  /** Importance weights against PERSISTED models ([[LangModel
    * .writeLmModel]]) — the epoch posture: train the raw and target
    * models once, rehydrate the quantized cost maps, and run the same
    * scoring kernel; value-identical to [[importanceWeights]] because
    * both paths read the same DECIMAL(18,9) costs and fall through
    * the same UNK/floor ladder. Cross-corpus batches are first-class
    * (exactRaw = false: a raw-model miss takes the ladder instead of
    * failing the self-corpus determinism check). */
  def importanceWeightsIndexed(docs: DataFrame, textCol: Column,
      idCol: Column, isTarget: Column, rawPath: String,
      tgtPath: String): DataFrame =
    weightKernel(docs, textCol, idCol, isTarget,
      LangModel.loadModel(docs.sparkSession, rawPath),
      LangModel.loadModel(docs.sparkSession, tgtPath),
      exactRaw = false)

  /** Deterministic selection: the `k` highest-weight NON-target
    * documents (weight desc, doc_id asc — engine-portable tie order).
    * Compiles to TakeOrderedAndProject over the weight scan. */
  def resampleTop(docs: DataFrame, textCol: Column, idCol: Column,
      isTarget: Column, k: Int, topK: Option[Int] = None): DataFrame =
    importanceWeights(docs, textCol, idCol, isTarget, topK)
      .filter(!col("is_target"))
      .orderBy(col("w_sum").desc, col("doc_id"))
      .limit(k)

  /** IMPORTANCE RESAMPLING proper — the paper's sampling-without-
    * replacement via the Gumbel-top-k trick: key_i = w_sum_i/T + g_i
    * with g_i standard Gumbel noise; taking the k largest keys IS a
    * weighted sample without replacement ∝ exp(w/T). The noise is a
    * seeded hash (xxhash64 → uniform (0,1) → −ln(−ln u)), so the
    * sample is reproducible and shard-order independent; still a
    * TakeOrdered, never a full sort. T → 0 recovers [[resampleTop]];
    * T = 1 is the paper's setting. Spec-gated (the noise is float, so
    * no SQL oracle; determinism + distribution asserted in tests). */
  def resampleGumbel(docs: DataFrame, textCol: Column, idCol: Column,
      isTarget: Column, k: Int, temperature: Double, seed: Long,
      topK: Option[Int] = None): DataFrame = {
    require(temperature > 0.0, "temperature must be positive")
    val u = (pmod(xxhash64(col("doc_id"), lit(seed)), lit(1L << 53))
      .cast("double") + lit(0.5)) / lit((1L << 53).toDouble)
    importanceWeights(docs, textCol, idCol, isTarget, topK)
      .filter(!col("is_target"))
      .withColumn("gumbel_key",
        col("w_sum") / lit(temperature) - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(k)
  }
}
