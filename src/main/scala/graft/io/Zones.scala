package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level ZONE-MAP data skipping — the lakehouse pruning layer
  * (Delta/Iceberg file statistics, classic zone maps): cluster a table
  * on a sort column into range files, record a manifest of per-file
  * (min, max, rows), and serve range predicates by consulting the
  * manifest FIRST so only overlapping files are ever listed into the
  * scan.
  *
  * Why this matters at 100 TB even though parquet already keeps
  * row-group min/max internally: parquet stats skip pages only AFTER
  * a task has been scheduled and the footer read. With a million
  * files, planning alone (listing + footer reads + task scheduling)
  * dominates a selective query. The manifest is file-count-sized —
  * KBs per PB — so the driver prunes to the overlapping files before
  * Spark ever lists the data directory, and a 0.1 %-selective range
  * query plans ~0.1 % of the tasks. Range clustering (one
  * `repartitionByRange` + in-file sort) is what makes the zones tight:
  * unsorted data gives every file ≈ the full domain and the manifest
  * prunes nothing.
  *
  * Layout:
  * {{{
  *   path/data/part-*.parquet      range-clustered on the zone column
  *   path/manifest/                (file, zmin, zmax, rows)
  * }}}
  */
object Zones {

  /** Write `df` range-clustered on `zoneCol` into ~`zones` files and
    * build the manifest in the same pass posture: one write, then one
    * manifest scan that aggregates per-file stats (the write's own
    * task stats would serve in a production sink; re-deriving from the
    * files keeps the manifest honest against whatever the writer
    * actually produced). */
  def writeZoned(df: DataFrame, path: String, zoneCol: String,
                 zones: Int): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(zones, col(zoneCol))
      .sortWithinPartitions(zoneCol)
      .write.mode("overwrite").parquet(s"$path/data")
    spark.read.parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(min(col(zoneCol)).as("zmin"), max(col(zoneCol)).as("zmax"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** The manifest-pruned file list for `[lo, hi]` — overlap test on
    * the per-file (zmin, zmax). Manifest-sized driver work. */
  def prunedFiles(spark: SparkSession, path: String,
                  lo: Column, hi: Column): Seq[String] =
    spark.read.parquet(s"$path/manifest")
      .filter(col("zmax") >= lo && col("zmin") <= hi)
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Range read through the manifest: only files whose zone overlaps
    * `[lo, hi]` enter the scan; the residual row filter still applies
    * (zones bound files, not rows). Empty overlap → empty frame with
    * the data schema, no data files touched. */
  def readZoneRange(spark: SparkSession, path: String, zoneCol: String,
                    lo: Column, hi: Column): DataFrame = {
    val files = prunedFiles(spark, path, lo, hi)
    val all = spark.read.parquet(s"$path/data")
    if (files.isEmpty) all.limit(0)
    else spark.read.parquet(files: _*)
      .filter(col(zoneCol) >= lo && col(zoneCol) <= hi)
  }

  /** Total data-file count per the manifest — for pruning audits. */
  def fileCount(spark: SparkSession, path: String): Long =
    spark.read.parquet(s"$path/manifest").count()
}
