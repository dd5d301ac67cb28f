package graft.io

import java.sql.{Date, Timestamp}

import graft.SparkSpec
import graft.io.pg.{PgLiteClient, PgLiteServer, PgWire}
import graft.pipeline.PgGold
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** The distributed wire writer under hostile data: nulls (which the
  * oracle gate never ships — its frame is clean-filled), tab/newline/
  * backslash payloads, and the full DDL type vocabulary through
  * `copyDistributed` → wire SELECT → `PgGold.fromWire`. */
class PgWireSpec extends SparkSpec {

  behavior of "PgWire.copyDistributed"

  it should "round-trip nulls, hostile strings, and typed columns across partitions" in {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("n", DecimalType(12, 2)),
      StructField("b", BooleanType),
      StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val data: Seq[Row] = (0 until 97).map { i =>
      Row(
        i.toLong,
        i % 7 match {
          case 0 => null
          case 1 => s"tab\there $i"
          case 2 => s"line\nbreak $i"
          case 3 => s"back\\slash $i"
          case 4 => "" // empty string is NOT null
          case _ => s"plain $i"
        },
        if (i % 5 == 0) null else i * 1.25,
        if (i % 6 == 0) null else new java.math.BigDecimal(s"$i.75"),
        if (i % 4 == 0) null else Boolean.box(i % 2 == 0),
        if (i % 8 == 0) null else new Timestamp(1700000000000L + i * 1000L),
        if (i % 9 == 0) null else Date.valueOf("2026-01-15"))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 5), schema)

    val (server, _) = PgLiteServer.start()
    try {
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      c.query(Sinks.createSchemaDdl("wide"))
      c.query(Sinks.createTableDdl(schema, "wide", "t"))
      // 4 concurrent per-partition connections over 5 input partitions
      PgWire.copyDistributed(df, "127.0.0.1", server.port,
        "wide.t", numPartitions = 4)
      val back = c.query(
        s"SELECT ${schema.fieldNames.mkString(", ")} FROM wide.t")
      c.close()
      val typed = PgGold.fromWire(spark, back.rows, schema)
      // order-free equality on every typed value, nulls included
      def key(r: Row) = r.getLong(0)
      val got = typed.collect().map(r => key(r) -> r.toSeq).toMap
      val want = data.map(r => key(r) -> r.toSeq).toMap
      got.keySet shouldBe want.keySet
      // decimal equality up to scale normalization (12.75 vs 12.75)
      got.foreach { case (k, vs) =>
        withClue(s"row $k:") {
          vs.zip(want(k)).foreach {
            case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
              a.compareTo(b) shouldBe 0
            case (a, b) => a shouldBe b
          }
        }
      }
    } finally server.stop()
  }

  it should "need no schema when the table does not exist: COPY fails up front" in {
    val (server, _) = PgLiteServer.start()
    try {
      import spark.implicits._
      val df = Seq((1L, "x")).toDF("k", "v")
      val e = intercept[org.apache.spark.SparkException](
        PgWire.copyDistributed(df, "127.0.0.1", server.port, "nope.t", 2))
      e.getMessage should include("does not exist")
    } finally server.stop()
  }
}
