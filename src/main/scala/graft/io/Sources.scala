package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source resolution (SURVEY.md §2 #1-#3, #10): format-dispatched reads
  * with the reference's unsupported-format guard, plus object-store and
  * JDBC configuration.
  *
  * Object-store note: the reference GETs whole objects from MinIO via
  * S3Hook (dags/dag_etl_minio_to_postgres.py:39-40). The engine reads
  * `s3a://bucket/key` directly through the Hadoop S3A connector —
  * distributed, split-capable, no driver-side materialization. The
  * endpoint/path-style settings below are exactly what a MinIO-backed
  * deployment sets; in this offline harness only `file://` paths are
  * exercised (no hadoop-aws jar ships with the image, and tests inject
  * local paths), but the resolution logic is identical.
  */
/** Result of a quarantined read: the two routes share ONE cached scan;
  * `release()` unpersists it — call it once both routes are consumed
  * (or after checkpointing whatever derives from them). */
final case class QuarantinedRead(
    clean: DataFrame, quarantine: DataFrame, release: () => Unit)

object Sources {

  /** Configure a session for an S3-compatible object store (MinIO). */
  def configureObjectStore(
      spark: SparkSession, endpoint: String,
      accessKey: String, secretKey: String): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", endpoint)
    hc.set("fs.s3a.access.key", accessKey)
    hc.set("fs.s3a.secret.key", secretKey)
    hc.set("fs.s3a.path.style.access", "true")
    hc.set("fs.s3a.connection.ssl.enabled", "false")
  }

  /** Format-dispatched read with the reference's guard (:46-47):
    * csv → distributed CSV scan (explicit schema preferred; header
    * inference mirrors :44-45 when absent); xlsx/xls → driver-side
    * [[Xlsx]] read; anything else → IllegalArgumentException. */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "csv" =>
        val r = spark.read.option("header", "true")
        schema match {
          case Some(s) => r.schema(s).csv(path)
          case None => r.option("inferSchema", "true").csv(path)
        }
      case "xlsx" | "xls" => Xlsx.read(spark, path)
      case "jsonl" | "json" => jsonl(spark, path, schema)
      case "orc" => orc(spark, path, schema)
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported source format '$other' for $path (expected csv/xlsx/xls/jsonl/orc)")
    }
  }

  /** ORC scan — the other columnar lake format Spark ships natively
    * (predicate pushdown + column pruning like parquet; pass the
    * schema to skip footer-based inference on wide tables). */
  def orc(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).orc(path)
      case None => spark.read.orc(path)
    }

  /** PERMISSIVE JSONL scan with corrupt-record QUARANTINE routing —
    * the bad-records path every production ingest needs: a malformed
    * line must neither kill the job (FAILFAST) nor silently vanish
    * (DROPMALFORMED); it lands in a quarantine frame for inspection
    * and replay. Returns clean rows in the caller's schema, the
    * quarantine of raw offending lines, and a `release` handle. The
    * parsed frame is cached because Spark disallows filtering a raw
    * JSON scan on ONLY the internal corrupt column (SPARK-21610); the
    * cache also keeps the two routes one scan. Callers MUST invoke
    * `release()` once both routes are consumed — without it the full
    * raw corpus stays pinned for the application lifetime (the
    * session-lifetime-cache leak this repo bans elsewhere). Quarantine
    * captures SYNTACTIC corruption — a well-formed object with missing
    * fields parses to nulls by schema contract and stays on the clean
    * route (the reference's null-fill rules own those). */
  def jsonlWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): QuarantinedRead = {
    val corruptCol = "_corrupt_record"
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(corruptCol,
        org.apache.spark.sql.types.StringType, nullable = true))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val clean = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    QuarantinedRead(clean, quarantine, () => { raw.unpersist(); () })
  }

  /** JSON-Lines scan — the de-facto corpus interchange format of LLM
    * data pipelines (one JSON object per line, newline-safe because
    * linebreaks inside strings are escaped). Distributed and
    * split-capable like CSV; pass the schema to skip the inference
    * scan (at 100 TB inference is a full extra pass — always pass it).
    * Reading with an explicit schema also round-trips nulls: the
    * writer omits null fields, the schema restores them as null. */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None => spark.read.json(path)
    }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JDBC table scan (§2 #10). `SELECT *` in the reference (:143);
    * here Catalyst prunes columns and pushes predicates into the query
    * it sends. `partitionColumn`-based parallel reads are exposed for
    * big tables (the reference reads one connection single-threaded). */
  def jdbc(
      spark: SparkSession, url: String, table: String,
      props: java.util.Properties,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitionColumn match {
      case Some((col, lo, hi, n)) =>
        spark.read.jdbc(url, table, col, lo, hi, n, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** bucket/folder/file munging (§2 #22). */
  def splitObjectPath(path: String): (String, String, String) = {
    val parts = path.split("/")
    require(parts.length >= 2, s"expected bucket/…/file, got $path")
    (parts.head, parts.drop(1).dropRight(1).mkString("/"), parts.last)
  }
}
