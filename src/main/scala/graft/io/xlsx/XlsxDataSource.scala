package graft.io.xlsx

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}
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
  *
  * With `.option("inferSchema", true)` columns whose data cells all
  * parse as integers surface as LongType (doubles → DoubleType,
  * anything else → StringType), matching `pd.read_excel`'s dtype
  * inference — the reference loads its config workbook through pandas
  * (dags/dag_etl_minio_to_postgres.py:42-43). A user-supplied
  * `.schema(...)` wins over inference either way; unparseable cells
  * under a numeric type read as null (pandas' coerce behavior). */
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
    val header = rows.head
    val types: Int => DataType =
      if (options.getBoolean("inferSchema", false)) {
        val width = header.length
        val data = rows.tail.map(_.padTo(width, null))
        i => XlsxTypes.inferColumn(data.iterator.map(_(i)))
      } else _ => StringType
    StructType(header.zipWithIndex.map { case (h, i) =>
      StructField(Option(h).getOrElse(""), types(i), nullable = true)
    })
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new XlsxTable(pathOf(opts), sheetOf(opts), schema)
  }
}

private[xlsx] object XlsxTypes {
  private val longRe = "[+-]?\\d{1,18}".r
  private val doubleRe = "[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r

  /** Narrowest of LongType < DoubleType < StringType that fits every
    * non-null cell (all-null columns stay StringType). Cells are
    * TRIMMED before matching — [[convert]] trims before parsing, and
    * the two layers must agree or a space-padded numeric column would
    * infer String while still being parseable. */
  def inferColumn(cells: Iterator[String]): DataType = {
    var seen = false
    var isLong = true
    var isDouble = true
    cells.foreach { raw =>
      if (raw != null) {
        val c = raw.trim
        seen = true
        if (isLong && !longRe.matches(c)) isLong = false
        if (!isLong && isDouble && !doubleRe.matches(c)) isDouble = false
      }
    }
    if (!seen) StringType
    else if (isLong) LongType
    else if (isDouble) DoubleType
    else StringType
  }

  /** String cell → catalyst value under the target type (null on
    * parse failure, pandas-coerce style). Unsupported target types
    * fail loudly rather than smuggling a UTF8String into a typed
    * column (which would corrupt rows or crash downstream codegen). */
  def convert(s: String, dt: DataType): Any =
    if (s == null) null
    else dt match {
      case LongType => try java.lang.Long.valueOf(s.trim) catch { case _: NumberFormatException => null }
      case IntegerType => try java.lang.Integer.valueOf(s.trim) catch { case _: NumberFormatException => null }
      case DoubleType => try java.lang.Double.valueOf(s.trim) catch { case _: NumberFormatException => null }
      case FloatType => try java.lang.Float.valueOf(s.trim) catch { case _: NumberFormatException => null }
      case BooleanType => s.trim.toLowerCase match {
        case "true" | "1" => java.lang.Boolean.TRUE
        case "false" | "0" => java.lang.Boolean.FALSE
        case _ => null
      }
      case StringType => UTF8String.fromString(s)
      case other => throw new UnsupportedOperationException(
        s"xlsx reader supports string/long/int/double/float/boolean columns; got $other")
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
    new XlsxReaderFactory(ordinals, required.fields.map(_.dataType))
  }
}

private case class XlsxPartition(path: String, sheet: Int) extends InputPartition

private class XlsxReaderFactory(ordinals: Array[Int], types: Array[DataType])
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
        InternalRow.fromSeq(ordinals.toIndexedSeq.zip(types).map {
          case (i, dt) => XlsxTypes.convert(padded(i), dt)
        })
      }
      override def close(): Unit = ()
    }
  }
}
