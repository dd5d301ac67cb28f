package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Main-table surrogate-id SCALE SWITCH (round-11, VERDICT r10 item 4).
  *
  * `Medallion.gold` step 4 is the one global-window `row_number` left
  * in the pipeline — reference parity for dimension-to-small-fact
  * scales, a single-task funnel at 100 TB. The switch must (a) keep
  * the ordered dense-id semantics the ref_* oracles replay at test
  * scales, (b) swap to [[graft.etl.Dims.withDistributedId]] above the
  * size threshold WITHOUT running an extra job (the decision reads
  * Catalyst's `optimizedPlan.stats`, the same signal as the broadcast
  * threshold), and (c) preserve the id contract either way: dense
  * 1..N when Ordered, globally unique when Distributed.
  *
  * Strategy discriminator: Ordered ids come from `row_number` (INT),
  * Distributed ids from 64-bit partition arithmetic (LONG) — asserted
  * alongside the value properties so a silent strategy flip cannot
  * pass.
  */
class GoldIdStrategySpec extends SparkSpec {

  import Medallion.{GoldSpec, IdStrategy}

  private def spec(strategy: IdStrategy): GoldSpec = GoldSpec(
    mainTable = "property",
    naturalKeyCols = Seq("title", "zip"),
    mainHashKeyCols = Seq("title", "zip"),
    dimKeyCols = Map("hoa" -> Seq("hoa")),
    mainIdStrategy = strategy)

  private def configDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("title", "property"), ("zip", "property"),
      ("rent", "leads"), ("hoa", "hoa"))
      .toDF("column_name", "target_table")
  }

  private def wideDf(n: Int, parts: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (s"house $i", s"${10000 + i}", s"${900 + i}", s"${i % 3}"))
      .toDF("title", "zip", "rent", "hoa")
      .repartition(parts)
  }

  private def mainOf(strategy: IdStrategy, n: Int = 7, parts: Int = 3) =
    Medallion.gold(wideDf(n, parts), configDf, spec(strategy))("property")

  behavior of "Medallion.gold main-table id strategy"

  it should "assign dense ordered 1..N ids under Ordered" in {
    val main = mainOf(IdStrategy.Ordered)
    main.schema("id").dataType shouldBe IntegerType
    main.select("id").collect().map(_.getInt(0)).sorted shouldBe (1 to 7).toArray
    // dense AND ordered by (property_key, natural_key) — the oracle contract
    val byKey = main.orderBy(col("property_key"), col("natural_key"))
      .select("id").collect().map(_.getInt(0))
    byKey shouldBe (1 to 7).toArray
  }

  it should "assign unique 64-bit ids with no global sort under Distributed" in {
    val main = mainOf(IdStrategy.Distributed)
    main.schema("id").dataType shouldBe LongType
    val ids = main.select("id").collect().map(_.getLong(0))
    ids.length shouldBe 7
    ids.distinct.length shouldBe 7
    all(ids) should be >= 1L
  }

  it should "resolve Auto to Ordered below the size threshold" in {
    val main = mainOf(IdStrategy.Auto()) // default 256 MB ≫ the fixture
    main.schema("id").dataType shouldBe IntegerType
    main.select("id").collect().map(_.getInt(0)).sorted shouldBe (1 to 7).toArray
  }

  it should "resolve Auto to Distributed above both size and row thresholds" in {
    val main = mainOf(IdStrategy.Auto(maxBytes = 0L, probeRows = 0L))
    main.schema("id").dataType shouldBe LongType
    val ids = main.select("id").collect().map(_.getLong(0))
    ids.distinct.length shouldBe 7
  }

  it should "correct an over-threshold size estimate via the bounded row probe" in {
    // RDD-backed frames have NO plan-size stats (Catalyst reports
    // ~Long.MaxValue), so the estimate alone would flip every
    // driver-constructed frame to Distributed; the probe keeps small
    // frames Ordered (this is the FullConfigSpec regression shape)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val headers = Seq("title", "zip", "rent", "hoa")
    val rows = (1 to 7).map(i =>
      Row(s"house $i", s"${10000 + i}", s"${900 + i}", s"${i % 3}"))
    val rddWide = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(headers.map(StructField(_, StringType, true))))
    rddWide.queryExecution.optimizedPlan.stats.sizeInBytes should be > (BigInt(256L << 20))
    val main = Medallion.gold(rddWide, configDf, spec(IdStrategy.Auto()))("property")
    main.schema("id").dataType shouldBe IntegerType
    main.select("id").collect().map(_.getInt(0)).sorted shouldBe (1 to 7).toArray
  }

  it should "keep facts FK-complete under either strategy" in {
    for (st <- Seq(IdStrategy.Ordered, IdStrategy.Distributed)) {
      val gold = Medallion.gold(wideDf(7, 3), configDf, spec(st))
      val main = gold("property")
      val facts = gold("leads")
      // every fact row's property_id exists in the main table
      facts.join(main, facts("property_id") === main("id"), "left_anti")
        .count() shouldBe 0L
    }
  }
}
