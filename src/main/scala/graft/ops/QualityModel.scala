package graft.ops

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TRAINED quality classifier over the document corpus (round-13):
  * the fasttext-style pattern every pretraining pipeline runs —
  * distill a hand rule into a smooth learned scorer — expressed as a
  * distributed ridge regression whose every number is
  * engine-reproducible, the [[Pca]] bar applied to supervised
  * training:
  *
  *   - FEATURIZE: 4 per-doc features on the DECIMAL(12,9) grid
  *     (bias, stopword ratio, punctuation ratio, capped length), each
  *     ONE correctly-rounded double expression re-gridded via the
  *     shortest-string hop; the weak label distils the q_text_quality
  *     rule (decided on the GRIDDED ratio, so both engines agree at
  *     the boundary);
  *   - CENSUS: one scan, 10 upper-triangle XᵀX sums + 4 Xᵀy sums + n
  *     as exact-decimal map-side partial aggregates — d²-bounded
  *     output (the moment-census posture: rows never leave, sums do);
  *   - TRAIN: K fixed full-batch gradient steps on the collected d²
  *     matrix (driver metadata): wᵢ ← grid(wᵢ − η·(Σⱼ Aᵢⱼwⱼ − bᵢ))
  *     with A = grid(XᵀX/n) + λI, b = grid(Xᵀy/n) — every step exact
  *     decimal between the two VARCHAR-hop grid points, so the oracle
  *     unrolls the loop as K chained CTEs emitted by the SAME loop;
  *   - SCORE: broadcast the K-step weights as plan literals and take
  *     one exact-decimal dot per doc in the scan — the corpus-sized
  *     stage is a projection, no shuffle, no iteration.
  *
  * Scale shape: training traffic is 15 decimal sums regardless of
  * corpus size; scoring is scan-fused. At 100 TB the census partials
  * are partitions × 15 values and the iteration cost is O(K·d²) on
  * the driver — the same "census, never rows" contract as Lloyd/PCA.
  */
object QualityModel {

  val Dims = 4
  val Iters = 96
  val Eta = "0.9"      // gradient step, exact DECIMAL(2,1); spectral
                       // radius of A measured 1.77 at sf0.1 → the
                       // stability bound 2/λmax ≈ 1.13 holds
  val Lambda = "0.001" // ridge, exact DECIMAL(18,9) on the diagonal

  private def q(d: Double, scale: Int): JBD =
    new JBD(java.lang.Double.toString(d)).setScale(scale, RoundingMode.HALF_UP)

  /** Shortest-string re-grid of a double expression — the Spark twin
    * of the oracle's `CAST(CAST(x AS VARCHAR) AS DECIMAL(12,9))`. */
  private def grid(c: Column): Column =
    c.cast("string").cast("decimal(12,9)")

  /** Gridded feature frame: doc_id, x1..x4 DECIMAL(12,9), y
    * DECIMAL(12,9) ∈ {0,1}. The label threshold compares the GRIDDED
    * stop ratio so the decision boundary is grid-exact in both
    * engines. */
  def features(d: DataFrame): DataFrame = {
    val nWords = Text.tokenCount(col("text"))
    val nStop = Text.stopwordCount(col("text"), Text.langMarkers("en"))
    val nChars = length(col("text"))
    d.select(
        col("doc_id"),
        nWords.as("n_words"),
        lit(1).cast("decimal(12,9)").as("x1"),
        // ×4 / ÷10 / ÷100: feature scaling that preconditions A's
        // spectrum (all features O(1)) so K fixed steps at η reach
        // the ridge optimum — measured acc 0.905 vs the 0.906
        // closed-form cap (and a 0.793 keep-all base rate) at sf0.1
        grid(lit(4.0) * nStop.cast("double") / nWords.cast("double")).as("x2"),
        grid(nChars.cast("double") / nWords.cast("double") / lit(10.0)).as("x3"),
        grid(least(nWords, lit(100)).cast("double") / lit(100.0)).as("x4"))
      .withColumn("y",
        // 0.2 = 4 × the q_text_quality 0.05 rule, decided on the
        // GRIDDED scaled ratio so the boundary is grid-exact
        when(col("n_words") >= 20 && col("n_words") <= 2000 &&
             col("x2") >= lit("0.2").cast("decimal(12,9)"),
          lit(1)).otherwise(lit(0)).cast("decimal(12,9)"))
      .drop("n_words")
  }

  private def xc(i: Int): String = s"x$i"

  /** One-scan exact-decimal census: upper-triangle Σxᵢxⱼ (i ≤ j),
    * Σxᵢy, n. */
  def census(f: DataFrame): (Map[(Int, Int), JBD], Map[Int, JBD], Long) = {
    val pairAggs = for { i <- 1 to Dims; j <- i to Dims } yield
      sum(col(xc(i)) * col(xc(j))).as(s"s$i$j")
    val yAggs = (1 to Dims).map(i => sum(col(xc(i)) * col("y")).as(s"b$i"))
    val row = f.agg(pairAggs.head,
      (pairAggs.tail ++ yAggs :+ count(lit(1)).as("n")): _*).head()
    val sij = (for { i <- 1 to Dims; j <- i to Dims } yield
      (i, j) -> row.getDecimal(row.fieldIndex(s"s$i$j"))
        .asInstanceOf[java.math.BigDecimal]).toMap
    val bi = (1 to Dims).map(i =>
      i -> row.getDecimal(row.fieldIndex(s"b$i"))).toMap
    (sij, bi, row.getLong(row.fieldIndex("n")))
  }

  /** The (A, b) system on the (18,9) grid: A = grid(XᵀX/n) + λI,
    * b = grid(Xᵀy/n). */
  private def system(sij: Map[(Int, Int), JBD], bi: Map[Int, JBD], n: Long)
      : (Array[Array[JBD]], Array[JBD]) = {
    val lam = new JBD(Lambda).setScale(9)
    val a = Array.tabulate(Dims, Dims) { (i0, j0) =>
      val (i, j) = (i0 + 1, j0 + 1)
      val s = sij(if (i <= j) (i, j) else (j, i))
      val base = q(s.doubleValue / n, 9)
      if (i == j) base.add(lam) else base
    }
    val b = Array.tabulate(Dims) { i0 =>
      q(bi(i0 + 1).doubleValue / n, 9)
    }
    (a, b)
  }

  /** K fixed gradient steps, every step exact decimal between grid
    * hops — the driver-side iteration the oracle unrolls. */
  def train(sij: Map[(Int, Int), JBD], bi: Map[Int, JBD], n: Long): Array[JBD] = {
    val (a, b) = system(sij, bi, n)
    val eta = new JBD(Eta)
    var w = Array.fill(Dims)(JBD.ZERO.setScale(9))
    for (_ <- 1 to Iters) {
      w = Array.tabulate(Dims) { i =>
        var g = JBD.ZERO
        var j = 0
        while (j < Dims) { g = g.add(a(i)(j).multiply(w(j))); j += 1 }
        val step = w(i).subtract(eta.multiply(g.subtract(b(i))))
        q(step.doubleValue, 9)
      }
    }
    w
  }

  /** Weight table: one row per dim — the model artifact a pipeline
    * persists and audits. */
  def modelFrame(spark: SparkSession, docs: DataFrame): DataFrame = {
    val (sij, bi, n) = census(features(docs))
    val w = train(sij, bi, n)
    val rows = (1 to Dims).map(i => Row(i, w(i - 1).doubleValue, n))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("dim", IntegerType, false),
        StructField("w", DoubleType, false),
        StructField("n", LongType, false))))
  }

  /** Corpus scoring: the trained weights ride the plan as decimal
    * literals; per doc ONE exact-decimal 4-term dot + the 0.5 keep
    * threshold decided in decimal — a pure projection over the scan. */
  def scoredFrame(docs: DataFrame): DataFrame = {
    val (sij, bi, n) = census(features(docs))
    scoredFrameWith(docs, train(sij, bi, n))
  }

  /** Persist the trained model as a parquet artifact tree — the epoch
    * posture: train once, score any later batch or stream without
    * re-running the census. Layout:
    *   `path/census`  — ONE row of exact-decimal moment sums (10
    *     upper-triangle XᵀX + 4 Xᵀy, stored as plain strings) + n:
    *     the SUFFICIENT STATISTIC, which is what makes [[appendModel]]
    *     possible without rescanning the prior corpus;
    *   `path/weights` — the K-step weights (dim, w, n).
    * Commit is the staged-tree swap ([[graft.io.Fs.replaceDir]]); a
    * crashed build leaves the prior tree intact. The stored weight
    * doubles round-trip the 9-decimal grid exactly (shortest-string
    * doubles of ≤15 significant digits re-grid to the same decimal). */
  def writeModel(spark: SparkSession, docs: DataFrame, path: String): Unit =
    writeTree(spark, census(features(docs)), path)

  /** INCREMENTAL model maintenance — fold a new document batch into a
    * persisted model WITHOUT rescanning the prior corpus: exact
    * decimal sums are associative, so batch census + stored census is
    * the combined-corpus census EXACTLY, and retraining from the
    * merged sums is bit-identical to a one-shot build (gated by
    * q_text_quality_incremental against the one-shot oracle). */
  def appendModel(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    graft.io.Fs.recoverAside(spark, path)
    val (s0, b0, n0) = readCensus(spark, path)
    val (s1, b1, n1) = census(features(batch))
    writeTree(spark,
      (s0.map { case (k, v) => k -> v.add(s1(k)) },
        b0.map { case (k, v) => k -> v.add(b1(k)) },
        n0 + n1),
      path)
  }

  private def writeTree(spark: SparkSession,
      cen: (Map[(Int, Int), JBD], Map[Int, JBD], Long), path: String): Unit = {
    val (sij, bi, n) = cen
    val staging = s"$path.staging"
    graft.io.Fs.deleteRecursive(spark, staging)
    val censusCols =
      (for { i <- 1 to Dims; j <- i to Dims } yield
        (s"s$i$j", sij((i, j)).toPlainString)) ++
      (1 to Dims).map(i => (s"b$i", bi(i).toPlainString))
    val censusRow = Row.fromSeq(censusCols.map(_._2) :+ n)
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(censusRow), 1),
        StructType(censusCols.map(c =>
          StructField(c._1, StringType, false)) :+
          StructField("n", LongType, false)))
      .write.parquet(s"$staging/census")
    val w = train(sij, bi, n)
    val rows = (1 to Dims).map(i => Row(i, w(i - 1).doubleValue, n))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("dim", IntegerType, false),
          StructField("w", DoubleType, false),
          StructField("n", LongType, false))))
      .write.parquet(s"$staging/weights")
    graft.io.Fs.replaceDir(spark, staging, path)
  }

  private def readCensus(spark: SparkSession, path: String)
      : (Map[(Int, Int), JBD], Map[Int, JBD], Long) = {
    val r = spark.read.parquet(s"$path/census").head()
    val sij = (for { i <- 1 to Dims; j <- i to Dims } yield
      (i, j) -> new JBD(r.getString(r.fieldIndex(s"s$i$j")))).toMap
    val bi = (1 to Dims).map(i =>
      i -> new JBD(r.getString(r.fieldIndex(s"b$i")))).toMap
    (sij, bi, r.getLong(r.fieldIndex("n")))
  }

  /** Reload the K-step weights from a persisted model. */
  def loadWeights(spark: SparkSession, path: String): Array[JBD] = {
    graft.io.Fs.recoverAside(spark, path)
    val rows = spark.read.parquet(s"$path/weights")
      .orderBy(col("dim")).select("dim", "w").collect()
    require(rows.length == Dims, s"model at $path has ${rows.length} dims")
    rows.map(r => q(r.getDouble(1), 9))
  }

  /** Score from a persisted model — identical plan to [[scoredFrame]]
    * (weights as decimal literals), zero training work. */
  def scoredFrameIndexed(docs: DataFrame, modelPath: String): DataFrame =
    scoredFrameWith(docs, loadWeights(docs.sparkSession, modelPath))

  /** Score with already-loaded weights — the streaming leg loads the
    * artifact once at stream start and scores every micro-batch
    * through this shared path. */
  def scoredFrameWith(docs: DataFrame, w: Array[JBD]): DataFrame = {
    val f = features(docs)
    val dot = (1 to Dims).map { i =>
      col(xc(i)) * lit(w(i - 1).toPlainString).cast("decimal(12,9)")
    }.reduce(_ + _)
    f.select(
        col("doc_id"),
        dot.as("sdec"),
        col("y").cast("int").as("label"))
      .select(
        col("doc_id"),
        col("sdec").cast("string").cast("double").as("score"),
        (col("sdec") >= lit("0.5").cast("decimal(12,9)")).as("keep"),
        col("label"))
      .withColumn("agree", col("keep") === (col("label") === 1))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // Generated DuckDB oracle — the same constants and loop emit the
  // SQL, so Spark and the oracle cannot drift structurally.
  // ---------------------------------------------------------------

  /** Feature + census + system CTEs shared by both oracles. */
  private def oracleBody(table: String): String = {
    val pairSel = (for { i <- 1 to Dims; j <- i to Dims } yield
      s"sum(x$i*x$j) AS s$i$j").mkString(",\n             ")
    val ySel = (1 to Dims).map(i => s"sum(x$i*y) AS b$i").mkString(", ")
    val aRows = (for { i <- 1 to Dims; j <- 1 to Dims } yield {
      val s = if (i <= j) s"s$i$j" else s"s$j$i"
      val lam = if (i == j) s" + CAST($Lambda AS DECIMAL(18,9))" else ""
      s"""SELECT $i AS i, $j AS j,
           CAST(CAST(CAST(CAST($s AS VARCHAR) AS DOUBLE) / n AS VARCHAR)
             AS DECIMAL(18,9))$lam AS c FROM cen"""
    }).mkString("\n           UNION ALL ")
    val bRows = (1 to Dims).map { i =>
      s"""SELECT $i AS i,
           CAST(CAST(CAST(CAST(b$i AS VARCHAR) AS DOUBLE) / n AS VARCHAR)
             AS DECIMAL(18,9)) AS b FROM cen"""
    }.mkString("\n           UNION ALL ")
    // every w_k is referenced twice by iteration k+1 — MATERIALIZED
    // keeps DuckDB's CTE evaluation linear in K (un-materialized
    // inlining doubles the expression tree per step → 2^K blowup)
    val iters = (1 to Iters).map { k =>
      s"""g$k AS MATERIALIZED (
           SELECT a.i, sum(a.c * w${k - 1}.v) AS gs
           FROM amat a JOIN w${k - 1} ON w${k - 1}.i = a.j GROUP BY a.i),
         w$k AS MATERIALIZED (
           SELECT g.i,
             CAST(CAST(CAST(CAST(
               w${k - 1}.v - CAST($Eta AS DECIMAL(2,1)) * (g.gs - b.b)
             AS VARCHAR) AS DOUBLE) AS VARCHAR) AS DECIMAL(12,9)) AS v
           FROM g$k g
           JOIN bvec b ON b.i = g.i
           JOIN w${k - 1} ON w${k - 1}.i = g.i)"""
    }.mkString(",\n         ")
    s"""WITH counts AS MATERIALIZED (
           SELECT doc_id,
             CAST(length(text) AS INT) AS n_chars,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS INT) AS n_words,
             CAST(len(regexp_extract_all(lower(text),
               '\\b(the|and|of|to|in|is|data|table)\\b')) AS INT) AS n_stop
           FROM $table),
         fx AS MATERIALIZED (
           SELECT doc_id, n_words,
             CAST(1 AS DECIMAL(12,9)) AS x1,
             CAST(CAST(4.0 * CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE)
               AS VARCHAR) AS DECIMAL(12,9)) AS x2,
             CAST(CAST(CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) / 10.0
               AS VARCHAR) AS DECIMAL(12,9)) AS x3,
             CAST(CAST(CAST(least(n_words, 100) AS DOUBLE) / 100.0
               AS VARCHAR) AS DECIMAL(12,9)) AS x4
           FROM counts),
         f AS MATERIALIZED (
           SELECT doc_id, x1, x2, x3, x4,
             CASE WHEN n_words >= 20 AND n_words <= 2000
                       AND x2 >= CAST(0.2 AS DECIMAL(12,9))
                  THEN CAST(1 AS DECIMAL(12,9))
                  ELSE CAST(0 AS DECIMAL(12,9)) END AS y
           FROM fx),
         cen AS MATERIALIZED (
           SELECT $pairSel,
             $ySel, count(1) AS n FROM f),
         amat AS MATERIALIZED (
           $aRows),
         bvec AS MATERIALIZED (
           $bRows),
         w0 AS MATERIALIZED (SELECT unnest(range(1, ${Dims + 1})) AS i,
           CAST(0 AS DECIMAL(12,9)) AS v),
         $iters"""
  }

  /** Model oracle: the K-step weights, hopped to doubles. */
  def modelOracleSql(table: String): String =
    oracleBody(table) +
      s"""
       SELECT w$Iters.i AS dim,
         CAST(CAST(w$Iters.v AS VARCHAR) AS DOUBLE) AS w,
         (SELECT n FROM cen) AS n
       FROM w$Iters ORDER BY dim"""

  /** The per-doc score CTEs appended to the training body. */
  private def scoreCtes: String =
    s"""
       , fu AS (
           ${(1 to Dims).map(i =>
             s"SELECT doc_id, $i AS i, x$i AS x FROM f")
             .mkString("\n           UNION ALL ")}),
         sc AS MATERIALIZED (
           SELECT fu.doc_id, sum(fu.x * w$Iters.v) AS s
           FROM fu JOIN w$Iters ON w$Iters.i = fu.i GROUP BY fu.doc_id)"""

  /** Scoring oracle: per-doc exact-decimal dot + decimal threshold. */
  def scoredOracleSql(table: String): String =
    oracleBody(table) + scoreCtes +
      s"""
       SELECT f.doc_id,
         CAST(CAST(sc.s AS VARCHAR) AS DOUBLE) AS score,
         sc.s >= CAST(0.5 AS DECIMAL(12,9)) AS keep,
         CAST(f.y AS INT) AS label,
         (sc.s >= CAST(0.5 AS DECIMAL(12,9))) = (CAST(f.y AS INT) = 1) AS agree
       FROM f JOIN sc ON sc.doc_id = f.doc_id
       ORDER BY f.doc_id"""

  /** Composable oracle prefix ending in `qkeep(doc_id)` — the trained
    * keep set. Callers append their own CTEs + SELECT; the Spark twin
    * is `scoredFrame(...).filter(col("keep"))`. */
  def keepOraclePrefix(table: String): String =
    oracleBody(table) + scoreCtes +
      s""",
         qkeep AS MATERIALIZED (
           SELECT doc_id FROM sc WHERE s >= CAST(0.5 AS DECIMAL(12,9)))"""
}
