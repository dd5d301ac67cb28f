package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String normalization + typed null handling (SURVEY.md §2 #6, #7).
  *
  * [[trimStrings]] mirrors the reference's `trim_strings`
  * (dags/dag_etl_minio_to_postgres.py:88-94): every string column is
  * `strip()`ed then `lower()`ed, and empty strings become null.
  * Implemented as ONE projection over all columns — Catalyst's
  * CollapseProject fuses it with adjacent selects so the whole cleaning
  * pipeline executes in a single codegen'd pass (the reference does three
  * full-frame materializations).
  *
  * [[fillNulls]] mirrors `fill_nulls` (:98-106): integral columns get -1,
  * string columns get 'unknown', floating/decimal columns keep their
  * nulls. Per SURVEY.md §7.4(1) we deliberately fill *all* integral
  * columns rather than replicating pandas' dtype accident (an int column
  * that ever held a null has already become float64 in pandas and is
  * silently skipped there).
  *
  * Both are narrow, shuffle-free transformations: at 100 TB they run
  * embedded in the scan stage with no data movement.
  */
object Clean {

  private def isStringType(f: StructField): Boolean = f.dataType == StringType

  private def isIntegralType(f: StructField): Boolean = f.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** strip + lower every string column; '' → null. */
  def trimStrings(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (isStringType(f)) nullif(lower(trim(col(f.name))), lit("")).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** -1 for integral nulls, 'unknown' for string nulls; others untouched. */
  def fillNulls(df: DataFrame): DataFrame = {
    val intCols = df.schema.fields.filter(isIntegralType).map(_.name)
    val strCols = df.schema.fields.filter(isStringType).map(_.name)
    df.na.fill(-1, intCols).na.fill("unknown", strCols)
  }

  /** The silver-stage cleaning pipeline (reference :281-283). */
  def clean(df: DataFrame): DataFrame =
    fillNulls(trimStrings(Standardize.standardizeHeaders(df)))
}
