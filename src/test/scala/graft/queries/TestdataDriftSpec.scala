package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Testdata schema-drift CANARY (round-10 verdict item 3).
  *
  * The /root/testdata snapshot has been regenerated at least once
  * (events.ts drifted from parquet TIMESTAMP(NANOS) to
  * TIMESTAMP_MICROS), and the failure mode was SILENT: 12 events-family
  * rows vanished from CORRECTNESS instead of one red spec. This suite
  * reads every sf0.001 table through its `Tables` loader and pins the
  * logical schema every consumer depends on — the next drift turns
  * these named assertions red instead of eating correctness rows.
  *
  * Pinned types are the LOGICAL contract, not the physical encoding:
  * `events.ts` must come out session-TZ TimestampType no matter how the
  * file spells it (that is `Tables.events`'s whole job); everything
  * else is pinned to what the current snapshot yields — a change there
  * is exactly the drift signal this canary exists to raise.
  */
class TestdataDriftSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fields(name: String): Seq[(String, DataType)] = {
    val df =
      if (name == "events") Tables.events(spark, sf)
      else Tables.t(spark, sf, name)
    df.schema.fields.toSeq.map(f => f.name -> f.dataType)
  }

  behavior of "the testdata snapshot (read through Tables loaders)"

  it should "yield events with a normalized session-TZ timestamp" in {
    fields("events") shouldBe Seq(
      "event_id" -> LongType,
      "ts" -> TimestampType, // regardless of the file's physical encoding
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType)
  }

  it should "yield the pinned region/nation schemas" in {
    fields("region") shouldBe Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    fields("nation") shouldBe Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
  }

  it should "yield the pinned customer/supplier/part schemas" in {
    fields("customer") shouldBe Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    fields("supplier") shouldBe Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    fields("part") shouldBe Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }

  it should "yield the pinned orders/lineitem schemas" in {
    fields("orders") shouldBe Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType)
    fields("lineitem") shouldBe Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
  }

  it should "yield the pinned documents/embeddings schemas" in {
    fields("documents") shouldBe Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    fields("embeddings") shouldBe Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  }

  it should "read at least one row from every table" in {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, sf)
        else Tables.t(spark, sf, name)
      withClue(s"$name: ") { df.limit(1).count() shouldBe 1L }
    }
  }
}
