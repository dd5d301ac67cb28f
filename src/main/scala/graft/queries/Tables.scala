package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared testdata table loaders. */
object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as a
    * long and rebuild a (microsecond) timestamp with integral division —
    * lossless here: the generator emits microsecond-precision values
    * (verified: 0 rows with epoch_ns % 1000 != 0), and the DuckDB
    * oracle applies the matching CAST(ts AS TIMESTAMP). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
