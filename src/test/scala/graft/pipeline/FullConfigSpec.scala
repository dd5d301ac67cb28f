package graft.pipeline

import graft.SparkSpec
import graft.etl.Dims
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Gold-stage golden test against the reference's FULL 66-column Field
  * Config (FIXTURES.md §2 — decoded from assets/data/Field Config.xlsx,
  * including the deliberate Leads/leads and HOA/Taxes case mixtures).
  * Verifies the column routing produces exactly the reference's six
  * gold tables with the documented widths (SURVEY.md §1.3):
  * property = 5 keys + 32 attrs, leads = id + 9, valuation = id + 9,
  * rehab = id + 13, hoa = key+id + 2, taxes = key+id + 1. */
class FullConfigSpec extends SparkSpec {

  private val routing: Seq[(String, String)] = Seq(
    // → property (32)
    "Property_Title", "Address", "Market", "Flood", "Street_Address",
    "City", "State", "Zip", "Property_Type", "Highway", "Train",
    "Tax_Rate", "SQFT_Basement", "HTW", "Pool", "Commercial", "Water",
    "Sewage", "Year_Built", "SQFT_MU", "SQFT_Total", "Parking", "Bed",
    "Bath", "BasementYesNo", "Layout", "Rent_Restricted",
    "Neighborhood_Rating", "Latitude", "Longitude", "Subdivision",
    "School_Average").map(_ -> "property") ++ Seq(
    // → leads (9, mixed-case targets as in the real config)
    "Reviewed_Status" -> "Leads", "Most_Recent_Status" -> "Leads",
    "Source" -> "leads", "Occupancy" -> "leads", "Net_Yield" -> "Leads",
    "IRR" -> "leads", "Selling_Reason" -> "Leads",
    "Seller_Retained_Broker" -> "leads", "Final_Reviewer" -> "Leads") ++ Seq(
    // → valuation (9)
    "Previous_Rent", "List_Price", "Zestimate", "ARV", "Expected_Rent",
    "Rent_Zestimate", "Low_FMR", "High_FMR", "Redfin_Value")
    .map(_ -> "Valuation") ++ Seq(
    // → rehab (13)
    "Underwriting_Rehab", "Rehab_Calculation", "Paint", "Flooring_Flag",
    "Foundation_Flag", "Roof_Flag", "HVAC_Flag", "Kitchen_Flag",
    "Bathroom_Flag", "Appliances_Flag", "Windows_Flag",
    "Landscaping_Flag", "Trashout_Flag").map(_ -> "Rehab") ++ Seq(
    // → hoa (2), taxes (1)
    "HOA" -> "HOA", "HOA_Flag" -> "HOA", "Taxes" -> "Taxes")

  "Medallion.gold" should "route the full 66-column reference config" in {
    routing.length shouldBe 66

    import spark.implicits._
    val config = Medallion.silverConfig(
      routing.toDF("Column Name", "Target Table"))

    // wide frame: 3 rows, every raw column a distinct string value
    val headers = routing.map(_._1)
    val rows = (1 to 3).map { r =>
      Row.fromSeq(headers.map(h => s"v${r}_$h"))
    }
    val wide0 = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(headers.map(StructField(_, StringType, nullable = true))))
    val wide = Medallion.silver(wide0)

    val gold = Medallion.gold(wide, config, Medallion.referenceSpec)
    gold.keySet shouldBe Set("property", "leads", "valuation", "rehab", "hoa", "taxes")

    gold("property").columns.length shouldBe 5 + 32 // id,natural_key,property_key,hoa_key,taxes_key + attrs
    gold("property").columns.take(3).toSeq shouldBe Seq("id", "natural_key", "property_key")
    gold("leads").columns.length shouldBe 1 + 9
    gold("leads").columns.head shouldBe "property_id"
    gold("valuation").columns.length shouldBe 1 + 9
    gold("rehab").columns.length shouldBe 1 + 13
    gold("hoa").columns.toSeq shouldBe Seq("hoa_key", "hoa", "hoa_flag", "id")
    gold("taxes").columns.toSeq shouldBe Seq("taxes_key", "taxes", "id")

    // snake-cased attribute names surfaced correctly
    gold("property").columns should contain allOf
      ("basement_yes_no", "sqft_mu", "neighborhood_rating", "school_average")
    gold("leads").columns should contain("reviewed_status")

    // integrity: 3 rows everywhere, FKs complete
    gold("property").count() shouldBe 3
    gold("leads").count() shouldBe 3
    Dims.fkViolations(gold("property"), gold("hoa"), "hoa_key").count() shouldBe 0
    gold("rehab").filter(col("property_id").isNull).count() shouldBe 0

    // DDL emission reproduces the reference's constraint surface
    val ddls = Medallion.goldDdls(gold, Medallion.referenceSpec)
    ddls("hoa") should include("hoa_key TEXT UNIQUE")
    ddls("leads") should include("property_id INTEGER REFERENCES gold.property(id)")
    ddls("property") should include("hoa_key TEXT REFERENCES gold.hoa(hoa_key)")
    ddls("property") should include("taxes_key TEXT REFERENCES gold.taxes(taxes_key)")
  }

  it should "run file-based end-to-end with the 66-row workbook" in {
    // the real pipeline shape: raw CSV + Field Config XLSX → bronze CSVs
    // → silver → gold, through the actual file formats
    val dir = tmpDir("fullconfig")
    val headers = routing.map(_._1)

    val csv = s"$dir/fake_data.csv"
    val pw = new java.io.PrintWriter(new java.io.FileOutputStream(csv))
    pw.println(headers.mkString(","))
    (1 to 4).foreach { r => pw.println(headers.map(h => s"V${r} $h").mkString(",")) }
    pw.close()

    val xlsx = s"$dir/Field Config.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(xlsx))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    val strings = ("Column Name" -> "Target Table") +: routing
    entry("xl/sharedStrings.xml",
      "<sst>" + strings.flatMap(p => Seq(p._1, p._2))
        .map(s => s"<si><t>$s</t></si>").mkString + "</sst>")
    entry("xl/worksheets/sheet1.xml",
      "<worksheet><sheetData>" + strings.indices.map { r =>
        s"""<row r="${r + 1}"><c r="A${r + 1}" t="s"><v>${2 * r}</v></c><c r="B${r + 1}" t="s"><v>${2 * r + 1}</v></c></row>"""
      }.mkString + "</sheetData></worksheet>")
    zos.close()

    val gold = Medallion.run(spark, csv, xlsx, s"$dir/bronze", Medallion.referenceSpec)
    gold.keySet shouldBe Set("property", "leads", "valuation", "rehab", "hoa", "taxes")
    gold("property").count() shouldBe 4
    gold("property").columns.length shouldBe 37
    gold("rehab").columns.length shouldBe 14
    // silver cleaning applied through the file path: lowered values
    gold("leads").select("reviewed_status").collect()
      .map(_.getString(0)).toSet shouldBe
      (1 to 4).map(r => s"v$r reviewed_status").toSet
  }
}
