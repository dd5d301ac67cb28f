package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-epoch SCHEMA EVOLUTION — the long-lived-pipeline reality the
  * single-snapshot readers don't cover: a crawl/curation layout whose
  * epochs gained columns over time (a quality score added in epoch 3,
  * a language tag in epoch 7) must still read as ONE frame.
  *
  * Built on parquet's native footer-merge (`mergeSchema`): the read
  * unions every epoch's fields, rows from epochs that predate a
  * column surface it as null, and [[readMerged]]'s `defaults` map
  * backfills those nulls with typed sentinels — the cross-epoch
  * application of the reference's null-fill rule
  * ([[graft.etl.Clean.fillNulls]], dag_etl_minio_to_postgres.py's
  * -1/'unknown' convention).
  *
  * Scale notes: footer merging is a driver-side metadata operation
  * (one footer per file — thousands, not billions); the backfill is a
  * codegen'd `coalesce` projection; and because epochs live under
  * `epoch=N` hive directories, epoch-pruned reads (`WHERE epoch = 7`)
  * skip old files entirely. Columns REMOVED by an epoch read back the
  * same way (null + backfill) — additive and subtractive drift both
  * land on the declared defaults instead of breaking downstream
  * schema contracts. */
object Evolve {

  /** Read an `epoch=N`-partitioned parquet layout with heterogeneous
    * per-epoch schemas as one schema-united frame, backfilling columns
    * absent in older epochs from `defaults` (column → sentinel). */
  def readMerged(
      spark: SparkSession, root: String,
      defaults: Map[String, Any]): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(root)
    defaults.foldLeft(df) { case (d, (c, v)) =>
      if (d.columns.contains(c)) d.withColumn(c, coalesce(col(c), lit(v)))
      else d.withColumn(c, lit(v))
    }
  }
}
