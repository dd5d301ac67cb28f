package graft.io

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.SparkSpec

/** Builds a minimal OOXML workbook by hand (zip + XML — the same wire
  * format decoded for FIXTURES.md §2) and reads it back. */
class XlsxSpec extends SparkSpec {

  private def writeXlsx(path: String): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>Column Name</t></si><si><t>Target Table</t></si>
        |<si><t>Property_Title</t></si><si><t>property</t></si>
        |<si><t>Reviewed_Status</t></si><si><t>Leads</t></si>
        |<si><t>HOA_Flag</t></si><si><t>HOA</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3" t="s"><v>5</v></c></row>
        |<row r="4"><c r="A4" t="s"><v>6</v></c><c r="B4" t="s"><v>7</v></c></row>
        |<row r="5"><c r="A5"><v>42</v></c><c r="B5" t="inlineStr"><is><t>inline</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  "Xlsx.writeRows" should "round-trip through the reader, escaping and nulls included" in {
    val path = tmpDir("xlsx") + "/written.xlsx"
    val rows = Seq(
      Seq("Column Name", "Target & Table", "X<y>z"),
      Seq("a & b", "<tag>", null),
      Seq("", "plain", "q > p"))
    Xlsx.writeRows(rows, path)
    val back = Xlsx.readRows(path)
    back.length shouldBe 3
    back(0) shouldBe Seq("Column Name", "Target & Table", "X<y>z")
    // null cells are skipped on write and padded back as null on read
    back(1) shouldBe Seq("a & b", "<tag>")
    back(2) shouldBe Seq("", "plain", "q > p")
  }

  it should "address columns beyond Z correctly (AA-style refs)" in {
    val path = tmpDir("xlsx") + "/wide.xlsx"
    val width = 30 // columns A..AD
    val header = (0 until width).map(i => s"c$i")
    val data = (0 until width).map(i => s"v$i")
    Xlsx.writeRows(Seq(header, data), path)
    val back = Xlsx.readRows(path)
    back(0) shouldBe header
    back(1) shouldBe data
    // and through the DataFrame reader, column order preserved
    val df = Xlsx.read(spark, path)
    df.columns.toSeq shouldBe header
    df.collect()(0).toSeq shouldBe data
  }

  "Xlsx.read" should "decode shared strings, inline strings, and numbers" in {
    val path = tmpDir("xlsx") + "/config.xlsx"
    writeXlsx(path)
    val df = Xlsx.read(spark, path)
    df.columns.toSeq shouldBe Seq("Column Name", "Target Table")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    rows should contain theSameElementsInOrderAs Seq(
      ("Property_Title", "property"),
      ("Reviewed_Status", "Leads"),
      ("HOA_Flag", "HOA"),
      ("42", "inline"))
  }

  "colIndex" should "decode A1-style refs" in {
    Xlsx.colIndex("A1") shouldBe 0
    Xlsx.colIndex("Z9") shouldBe 25
    Xlsx.colIndex("AA3") shouldBe 26
    Xlsx.colIndex("BC12") shouldBe 54
  }

  "the xlsx DataSource V2" should "read via spark.read.format with pruning" in {
    val path = tmpDir("xlsx") + "/dsv2.xlsx"
    writeXlsx(path)
    val df = spark.read.format("xlsx").load(path)
    df.columns.toSeq shouldBe Seq("Column Name", "Target Table")
    df.count() shouldBe 4
    // column pruning path: request one column only
    val one = df.select(df.col("Target Table")).collect().map(_.getString(0))
    one should contain("Leads")
    // option-driven sheet selection + schema inference agree with Xlsx.read
    spark.read.format("xlsx").option("sheet", "1").load(path).collect()
      .map(_.toSeq) shouldBe Xlsx.read(spark, path).collect().map(_.toSeq)
  }

  private def writeTypedXlsx(path: String): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>name</t></si><si><t>count</t></si>
        |<si><t>ratio</t></si><si><t>a</t></si><si><t>b</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>7</v></c><c r="C2"><v>1.5</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3"><v>42</v></c><c r="C3"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  it should "infer Long/Double column types with inferSchema" in {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val path = tmpDir("xlsx") + "/typed.xlsx"
    writeTypedXlsx(path)
    // default stays all-string (round-1 behavior preserved)
    val plain = spark.read.format("xlsx").load(path)
    plain.schema.fields.map(_.dataType).toSet shouldBe Set[org.apache.spark.sql.types.DataType](StringType)
    val typed = spark.read.format("xlsx").option("inferSchema", "true").load(path)
    typed.schema.fields.map(f => f.name -> f.dataType).toSeq shouldBe Seq(
      "name" -> StringType, "count" -> LongType, "ratio" -> DoubleType)
    val rows = typed.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.toSet shouldBe Set(("a", 7L, 1.5), ("b", 42L, 2.0))
  }

  "Sources.read" should "reject unsupported formats" in {
    // .json/.jsonl and .orc joined the dispatch in round 13 — the
    // guard now fires on genuinely unknown extensions
    an[IllegalArgumentException] should be thrownBy
      Sources.read(spark, "/tmp/x.avro")
    an[IllegalArgumentException] should be thrownBy
      Sources.read(spark, "/tmp/x.feather")
  }
}
