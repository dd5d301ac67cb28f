package graft.io.xlsx

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructType, StructField, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.io.Xlsx

/** DataSource V2 wrapper for the from-scratch [[graft.io.Xlsx]] reader
  * (SURVEY.md §4 "optional polish"): `spark.read.format("xlsx")
  * .load(path)` — registered under the short name via
  * DataSourceRegister + META-INF/services.
  *
  * Config workbooks are tiny (SURVEY.md §1.1 config-as-data), so the
  * scan is ONE input partition whose reader parses the zip on an
  * executor; schema inference reads just the header row on the driver.
  * Column pruning is honored by projecting the requested ordinals.
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "xlsx"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse {
      // spark.read.load(path) passes "paths" as a JSON array
      Option(options.get("paths")).map(_.replaceAll("""[\[\]" ]""", ""))
    }
    p.getOrElse(throw new IllegalArgumentException("xlsx source requires a path"))
  }

  private def sheetOf(options: CaseInsensitiveStringMap): Int =
    Option(options.get("sheet")).map(_.toInt).getOrElse(1)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val rows = Xlsx.readRows(pathOf(options), sheetOf(options))
    require(rows.nonEmpty, s"${pathOf(options)}: empty sheet")
    StructType(rows.head.map(h =>
      StructField(Option(h).getOrElse(""), StringType, nullable = true)))
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new XlsxTable(pathOf(opts), sheetOf(opts), schema)
  }
}

private class XlsxTable(path: String, sheet: Int, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"xlsx:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(path, sheet, tableSchema)
}

private class XlsxScanBuilder(path: String, sheet: Int, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new XlsxScan(path, sheet, full, required)
}

private class XlsxScan(
    path: String, sheet: Int, full: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(XlsxPartition(path, sheet))
  override def createReaderFactory(): PartitionReaderFactory = {
    val ordinals = required.fieldNames.map(full.fieldIndex)
    new XlsxReaderFactory(ordinals)
  }
}

private case class XlsxPartition(path: String, sheet: Int) extends InputPartition

private class XlsxReaderFactory(ordinals: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[XlsxPartition]
    new PartitionReader[InternalRow] {
      private val rows = Xlsx.readRows(part.path, part.sheet)
      private val width = if (rows.isEmpty) 0 else rows.head.length
      private val it = rows.iterator.drop(1) // skip header
      private var current: Seq[String] = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = {
        val padded = current.padTo(width, null)
        InternalRow.fromSeq(ordinals.toIndexedSeq.map { i =>
          Option(padded(i)).map(UTF8String.fromString).orNull
        })
      }
      override def close(): Unit = ()
    }
  }
}
