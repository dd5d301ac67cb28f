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

  "jsonlDir/jsonl" should "round-trip hostile document text and nulls" in {
    import spark.implicits._
    val df = Seq(
      (1L, "plain text", Some(10L)),
      (2L, "line\nbreak\tand \"quotes\" and \\slash", Some(0L)),
      (3L, "unicode: données 表格 ✓", None),
      (4L, null.asInstanceOf[String], Some(-1L)))
      .toDF("id", "text", "n")
    val path = freshDir("jsonl-roundtrip")
    Sinks.jsonlDir(df, path)
    val back = Sources.jsonl(spark, path, Some(df.schema))
      .orderBy("id").collect()
    val want = df.orderBy("id").collect()
    back.toSeq shouldBe want.toSeq
    // and the extension dispatch guard still rejects unknowns
    an[IllegalArgumentException] should be thrownBy
      Sources.read(spark, "x.avro")
  }

  "orcDir/orc" should "round-trip hostile document text and nulls" in {
    import spark.implicits._
    val df = Seq(
      (1L, "plain text", Some(10L)),
      (2L, "line\nbreak\tand \"quotes\" and \\slash", Some(0L)),
      (3L, "unicode: données 表格 ✓", None),
      (4L, null.asInstanceOf[String], Some(-1L)))
      .toDF("id", "text", "n")
    val path = freshDir("orc-roundtrip")
    Sinks.orcDir(df, path)
    Sources.orc(spark, path, Some(df.schema)).orderBy("id").collect()
      .toSeq shouldBe df.orderBy("id").collect().toSeq
  }

  "jsonlWithQuarantine" should "route malformed lines without touching clean rows" in {
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "v")
    val path = freshDir("jsonl-quarantine")
    Sinks.jsonlDir(df, path)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "bad.json"),
      "{oops\nnot json at all\n{\"id\": 9, \"v\": \"trailing\n")
    val qr = Sources.jsonlWithQuarantine(spark, path, df.schema)
    qr.clean.orderBy("id").collect().toSeq shouldBe df.orderBy("id").collect().toSeq
    val lines = qr.quarantine.collect().map(_.getString(0)).toSet
    lines shouldBe Set("{oops", "not json at all", "{\"id\": 9, \"v\": \"trailing")
    // release() drops the shared scan cache — nothing of this read
    // stays pinned in the session (fresh frame: QueryExecution memoizes
    // withCachedData, so probe cache state through a new Dataset)
    qr.release()
    qr.clean.filter(org.apache.spark.sql.functions.lit(true))
      .queryExecution.withCachedData.collectFirst {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
    } shouldBe None
    // a well-formed object MISSING fields is schema-null, not corrupt
    val path2 = freshDir("jsonl-quarantine-partial")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path2, "part.json"), "{\"id\": 5}\n")
    val qr2 = Sources.jsonlWithQuarantine(spark, path2, df.schema)
    qr2.quarantine.count() shouldBe 0
    val r = qr2.clean.head()
    r.getLong(0) shouldBe 5L
    r.isNullAt(1) shouldBe true
    qr2.release()
  }

  it should "scan jsonl through the format-dispatched read" in {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val path = freshDir("jsonl-dispatch") + "/part.jsonl"
    Sinks.jsonlDir(df.coalesce(1),
      new java.io.File(path).getParent + "/dir")
    // single .jsonl file path through read()
    val f = new java.io.File(new java.io.File(path).getParent + "/dir")
      .listFiles().filter(_.getName.startsWith("part-")).head
    val renamed = new java.io.File(f.getParent, "data.jsonl")
    f.renameTo(renamed) shouldBe true
    Sources.read(spark, renamed.getAbsolutePath, Some(df.schema))
      .count() shouldBe 2
  }
}
