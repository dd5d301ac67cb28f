package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Column reorder: move the last column first (SURVEY.md §2 #18;
  * reference dags/dag_etl_minio_to_postgres.py:232-240 — puts the
  * just-appended `property_id` in front before insert). Metadata-only
  * projection; zero runtime cost. */
object Reorder {
  def lastToFirst(df: DataFrame): DataFrame = {
    val cs = df.columns
    if (cs.length <= 1) df
    else df.select((cs.last +: cs.init.toSeq).map(col): _*)
  }

  def keyFirst(df: DataFrame, key: String): DataFrame = {
    val rest = df.columns.filterNot(_ == key).toSeq
    df.select((key +: rest).map(col): _*)
  }
}
