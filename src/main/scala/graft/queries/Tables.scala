package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared testdata table loaders. */
object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The testdata snapshot has shipped `events.ts` under two physical
    * encodings so far — TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright (PARQUET_TYPE_ILLEGAL) unless read as a long via
    * `nanosAsLong`, and plain TIMESTAMP_MICROS (isAdjustedToUTC=0),
    * which Spark reads natively as TIMESTAMP_NTZ. Normalize whatever
    * arrives to a session-TZ TimestampType so every consumer (and the
    * DuckDB oracle's CAST(ts AS TIMESTAMP)) sees one schema:
    *   - LongType (nanos snapshot): rebuild micros with integral
    *     division — lossless, the generator emits microsecond values
    *     (verified: 0 rows with epoch_ns % 1000 != 0);
    *   - TIMESTAMP_NTZ (micros snapshot): cast — value-identical under
    *     the UTC session TZ Verify/Bench/specs pin;
    *   - TimestampType: already normalized, pass through. */
  def eventsTsExpr(tsType: org.apache.spark.sql.types.DataType): Column =
    tsType match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — extend Tables.eventsTsExpr")
    }

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.withColumn("ts", eventsTsExpr(df.schema("ts").dataType))
  }
}
