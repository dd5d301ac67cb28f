package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types._

/** Sinks (SURVEY.md §2 #4, #8, #9, #21): single-object CSV writes,
  * batched JDBC writes, and a DDL emitter that reproduces the
  * reference's star-schema constraints.
  *
  * The reference's dominant cost (§6, ≥95 % of runtime) is one INSERT
  * round-trip per row through psycopg2 (:125-138). The engine writes
  * with `df.write.jdbc` — partitioned, batched (`batchsize`), and
  * transactional per partition. Surrogate ids are assigned engine-side
  * BEFORE the write (graft.etl.Dims), so the reference's per-row
  * `RETURNING id` read-back disappears entirely.
  */
object Sinks {

  /** Single-file CSV with the reference's object semantics (§2 #4):
    * `{lower(name).replace(' ','_')}.csv` as ONE object. `coalesce(1)`
    * + part-file rename. Single-object output is inherently
    * single-writer — this exists for config/export-sized frames;
    * large outputs use [[csvDir]]/parquet with N part files. */
  def csvSingleFile(df: DataFrame, dir: String, name: String): String = {
    val normalized = name.toLowerCase.replace(" ", "_")
    val target = Paths.get(dir, s"$normalized.csv")
    val tmp = Paths.get(dir, s".${normalized}_tmp")
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(tmp.toString)
    val part = Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    Files.list(tmp).forEach(Files.delete(_))
    Files.delete(tmp)
    target.toString
  }

  /** Distributed CSV write (the scale path). */
  def csvDir(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Distributed JSON-Lines write — one JSON object per line, N part
    * files (the corpus-export twin of [[Sources.jsonl]]). Newlines,
    * quotes, and control characters in string fields are JSON-escaped
    * by construction, so arbitrary document text survives the line
    * framing; null fields are omitted on write and restored by the
    * reader's schema. */
  def jsonlDir(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC export — distributed multi-part write, the columnar twin of
    * [[jsonlDir]]. */
  def orcDir(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Batched JDBC append (§2 #9). `batchsize` rows per round-trip per
    * partition — versus the reference's 1. `numPartitions` caps
    * concurrent connections against the database. */
  def jdbcBatch(
      df: DataFrame, url: String, table: String,
      props: java.util.Properties, batchSize: Int = 10000,
      numPartitions: Int = 8): Unit = {
    val p = new java.util.Properties()
    p.putAll(props)
    p.setProperty("batchsize", batchSize.toString)
    df.coalesce(numPartitions).write.mode(SaveMode.Append).jdbc(url, table, p)
  }

  /** Spark type → Postgres DDL type (mirrors the reference's DDL
    * vocabulary: TEXT / VARCHAR / INTEGER / NUMERIC, :296-315). */
  def pgType(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case IntegerType | ShortType | ByteType => "INTEGER"
    case LongType => "BIGINT"
    case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
    case DoubleType | FloatType => "DOUBLE PRECISION"
    case BooleanType => "BOOLEAN"
    // PG TIMESTAMP is WITHOUT time zone — NTZ is the exact match; the
    // zoned Spark type maps to the same DDL (the reference's psycopg2
    // leg never declares timestamptz)
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BYTEA"
    case other =>
      throw new IllegalArgumentException(s"no JDBC DDL mapping for $other")
  }

  /** CREATE TABLE emitter reproducing the reference's constraint
    * surface (§2 #8, #21): optional SERIAL surrogate key, UNIQUE dim
    * keys, FOREIGN KEY references. Idempotent (`IF NOT EXISTS`) unlike
    * the gold DDLs (:414 ff.), which are single-run. */
  def createTableDdl(
      schema: StructType, schemaName: String, table: String,
      serialPk: Option[String] = None,
      unique: Seq[String] = Nil,
      foreignKeys: Map[String, String] = Map.empty): String = {
    val cols = schema.fields.map { f =>
      val base = s"${f.name} ${pgType(f.dataType)}"
      val u = if (unique.contains(f.name)) " UNIQUE" else ""
      val fk = foreignKeys.get(f.name)
        .map(ref => s" REFERENCES $ref").getOrElse("")
      base + u + fk
    }
    val pk = serialPk.map(k => s"$k SERIAL PRIMARY KEY").toSeq
    s"CREATE TABLE IF NOT EXISTS $schemaName.$table (" +
      (pk ++ cols).mkString(", ") + ")"
  }

  /** Schema + table creation on the driver (§2 #8): Spark has no DDL
    * API for external RDBMS, so this is a plain JDBC statement. */
  def executeDdl(url: String, props: java.util.Properties, ddl: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(
      url, props.getProperty("user"), props.getProperty("password"))
    try {
      val st = conn.createStatement()
      try ddl.foreach(st.execute)
      finally st.close()
    } finally conn.close()
  }

  def createSchemaDdl(schemaName: String): String =
    s"CREATE SCHEMA IF NOT EXISTS $schemaName"
}
