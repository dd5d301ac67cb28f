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

  /** Gate-harness shuffle scope (round-13, VERDICT r12 item 7): the
    * stream-parity harnesses run MANY tiny micro-batch jobs whose wall
    * is per-task fixed cost at the session's 32 shuffle partitions —
    * state/commit/file-count overhead, not data. Inside the gate
    * harnesses (and ONLY there; engine queries keep the session
    * setting, which is the scale posture under test) shrink to 8 for
    * the duration, restoring on exit. Structured Streaming CLONES the
    * session conf at `start()`, so the scope must open before the
    * query starts — wrap the whole harness body. Every gated value is
    * partitioning-stable by repo policy (asserted per operator in the
    * specs), so this changes cost, never results. */
  def withGateShuffle[T](s: SparkSession, n: Int = 8)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
