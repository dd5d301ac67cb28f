package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical data layout for scale (SURVEY.md §4 levers): partitioned
  * directory layout for partition PRUNING (a filter on the partition
  * column skips whole directories at planning time — the 100 TB
  * equivalent of not reading 99 TB), and bucketed tables for
  * SHUFFLE-FREE joins (two tables bucketed by the join key into the
  * same bucket count join with zero Exchange — the key lever when the
  * same fact table is joined repeatedly on one key). */
object Layout {

  /** Hive-style partitioned parquet: one directory per value of each
    * partition column. Choose low-cardinality columns (date, type):
    * directory count = product of cardinalities. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed + sorted managed table (bucketing requires the table
    * catalog — plain parquet paths don't retain bucket metadata). */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
