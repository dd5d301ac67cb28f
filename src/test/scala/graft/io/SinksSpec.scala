package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

class SinksSpec extends SparkSpec {

  "csvSingleFile" should "write one normalized-name CSV object" in {
    import spark.implicits._
    val out = Sinks.csvSingleFile(
      Seq((1, "a"), (2, "b")).toDF("id", "v"), tmpDir("sink"), "Fake Data")
    out should endWith("fake_data.csv")
    val lines = scala.io.Source.fromFile(out).getLines().toList
    lines.head shouldBe "id,v"
    lines.size shouldBe 3
    // round-trip
    Sources.read(spark, out).count() shouldBe 2
  }

  "createTableDdl" should "reproduce the reference's constraint surface" in {
    val schema = StructType(Seq(
      StructField("hoa_key", StringType),
      StructField("hoa", IntegerType),
      StructField("hoa_flag", StringType)))
    Sinks.createTableDdl(schema, "gold", "hoa",
      serialPk = Some("id"), unique = Seq("hoa_key")) shouldBe
      "CREATE TABLE IF NOT EXISTS gold.hoa (id SERIAL PRIMARY KEY, " +
        "hoa_key TEXT UNIQUE, hoa INTEGER, hoa_flag TEXT)"

    val fact = StructType(Seq(
      StructField("property_id", IntegerType),
      StructField("net_yield", DecimalType(5, 2))))
    Sinks.createTableDdl(fact, "gold", "leads",
      serialPk = Some("id"),
      foreignKeys = Map("property_id" -> "gold.property(id)")) shouldBe
      "CREATE TABLE IF NOT EXISTS gold.leads (id SERIAL PRIMARY KEY, " +
        "property_id INTEGER REFERENCES gold.property(id), net_yield NUMERIC(5,2))"
  }

  "splitObjectPath" should "route bucket/folder/file" in {
    Sources.splitObjectPath("bronze/bronze-files/fake_data.csv") shouldBe
      (("bronze", "bronze-files", "fake_data.csv"))
  }
}
