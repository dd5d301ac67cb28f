package graft.io

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader (SURVEY.md §2 #2): the reference reads
  * `Field Config.xlsx` via pandas/openpyxl
  * (dags/dag_etl_minio_to_postgres.py:42-43); no Spark built-in exists
  * and this environment resolves no external packages, so this is a
  * from-scratch reader of the OOXML container: a zip holding
  * `xl/sharedStrings.xml` (string pool) and `xl/worksheets/sheetN.xml`
  * (cells with A1-style refs, shared-string / inline / numeric types).
  *
  * Config workbooks are tiny by construction (one row per column of the
  * dataset), so this is a DRIVER-SIDE read into a local Seq followed by
  * `createDataFrame` — the same treatment the engine gives all
  * config-as-data (SURVEY.md §1.1). Big-data inputs arrive as
  * CSV/parquet, never xlsx. All cells surface as strings; the first row
  * is the header (mirroring `pd.read_excel` defaults for this file).
  */
object Xlsx {

  private def parseXml(in: InputStream): Element = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(in).getDocumentElement
  }

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** "BC12" → 0-based column index 54. */
  private[io] def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Read sheet `sheetIdx` (1-based) as rows of strings. */
  def readRows(path: String, sheetIdx: Int = 1): Seq[Seq[String]] = {
    val zip = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] = Option(zip.getEntry("xl/sharedStrings.xml")) match {
        case Some(e) =>
          elems(parseXml(zip.getInputStream(e)), "si")
            .map(si => elems(si, "t").map(_.getTextContent).mkString).toIndexedSeq
        case None => IndexedSeq.empty
      }
      val sheetEntry = Option(zip.getEntry(s"xl/worksheets/sheet$sheetIdx.xml"))
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no worksheet #$sheetIdx"))
      val sheet = parseXml(zip.getInputStream(sheetEntry))
      elems(sheet, "row").map { row =>
        val cells = ArrayBuffer.empty[String]
        elems(row, "c").foreach { c =>
          val idx = colIndex(c.getAttribute("r"))
          while (cells.length <= idx) cells += null
          val v = c.getAttribute("t") match {
            case "s" => // shared string
              elems(c, "v").headOption.map(v => shared(v.getTextContent.trim.toInt)).orNull
            case "inlineStr" =>
              elems(c, "is").headOption.map(is => elems(is, "t").map(_.getTextContent).mkString).orNull
            case _ => // numeric / str / bool: take the raw value text
              elems(c, "v").headOption.map(_.getTextContent).orNull
          }
          cells(idx) = v
        }
        cells.toSeq
      }
    } finally zip.close()
  }

  /** Minimal single-sheet XLSX WRITER — the inverse wire format of
    * [[readRows]], emitting a spec-complete OOXML package: the package
    * rels, `xl/workbook.xml` + its rels, content-type declarations, and
    * one `xl/worksheets/sheet1.xml` with every cell as an inline string
    * (`t="inlineStr"`, XML-escaped, `xml:space="preserve"` so
    * leading/trailing whitespace survives conforming readers), no
    * shared-string pool. Exists for config/export-sized frames (the
    * same size class as [[Sinks.csvSingleFile]]) and as the fixture
    * source of the `ref_io_xlsx_scan` oracle row; null cells are
    * skipped, so they read back as null. Driver-side single-writer by
    * design. */
  def writeRows(rows: Seq[Seq[String]], path: String): String = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def colRef(i: Int): String = {
      var n = i + 1
      val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheet = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheet.append(s"""<row r="${ri + 1}">""")
      r.zipWithIndex.foreach { case (v, ci) =>
        if (v != null)
          sheet.append(s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>""")
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    try {
      def entry(name: String, content: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>""")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>""" +
          """</workbook>""")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>""")
      entry("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
    path
  }

  /** First row = header (snake-cased by callers as needed); remaining
    * rows = data; every column StringType. */
  def read(spark: SparkSession, path: String, sheetIdx: Int = 1): DataFrame = {
    val rows = readRows(path, sheetIdx)
    require(rows.nonEmpty, s"$path: empty sheet")
    val header = rows.head.map(h => Option(h).getOrElse(""))
    val width = header.length
    val data = rows.tail.map { r =>
      Row.fromSeq(r.padTo(width, null).take(width))
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList, 1), schema)
  }
}
