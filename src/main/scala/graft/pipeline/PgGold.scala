package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit, sum}
import org.apache.spark.sql.types._

import graft.io.Sinks
import graft.io.pg.{PgLiteClient, PgWire}

/** The gold star schema written through the LIVE wire-v3 endpoint
  * (VERDICT r15 task 4): the reference's actual Postgres protocol —
  * CREATE SCHEMA/TABLE with SERIAL surrogate keys
  * (dags/dag_etl_minio_to_postgres.py:413-551), row-at-a-time
  * `INSERT … RETURNING id` capture (the id_mapping dict, :125-138,
  * :478), and the engine's batched substitution, COPY — exercised
  * end-to-end by the FLAGSHIP (`ref_medallion`) and the gold-DDL-set
  * spec, not just the customer-segment miniature.
  *
  * Id discipline: tables are created with `id SERIAL PRIMARY KEY` and
  * loaded WITHOUT their engine-assigned id column, in engine-id order —
  * so the server's SERIAL assignment must land on exactly the engine's
  * dense ordered ids. [[writeTable]] verifies that equality on the
  * RETURNING head rows and the caller's oracle hash verifies it on the
  * whole read-back: any drift between DB-side and engine-side id
  * assignment breaks the gate.
  *
  * Size classes (r16 facts, r17 main): DIMS and the RETURNING-id
  * heads stay driver-side — that is the protocol-fidelity leg (the
  * reference IS one psycopg2 process) and dims are small by
  * construction. The MAIN table is CORPUS-sized in the reference's
  * star (gold.property: one row per input row after key-dedup, dag
  * :430-447), so [[writeMainDistributed]] keeps only the k-row
  * RETURNING probe on the driver and bulk-loads the remainder WITH
  * explicit ids through [[PgWire.copyDistributedExactlyOnce]],
  * continuing the sequence via setval. FACTS are input-sized, so
  * [[writeFactDistributed]] ships them through the same exactly-once
  * COPY. Both verify server-confirmed counts PLUS a fully distributed
  * cell-for-cell read-back comparison over
  * [[PgWire.readDistributed]]'s per-range wire scans — no
  * corpus-sized frame ever collects to the driver, and the whole
  * round trip (not a sample) sits under the check.
  */
object PgGold {

  /** Driver-side wire text for a frame's rows, in the frame's current
    * order (callers pre-sort by the engine id). */
  def textRows(df: DataFrame, cols: Seq[String]): Seq[Seq[Option[String]]] = {
    val idx = cols.map(df.columns.indexOf(_))
    df.collect().iterator.map { r =>
      idx.map(i => Option(r.get(i)).map(graft.io.pg.PgWire.wireText))
    }.toSeq
  }

  /** Rebuild a TYPED frame from wire text rows — the read-back half of
    * the round trip. Inverse of `Row.get(_).toString` for the DDL type
    * vocabulary ([[Sinks.pgType]]). */
  def fromWire(spark: SparkSession, rows: Seq[Seq[Option[String]]],
               schema: StructType): DataFrame = {
    val data = rows.map { r =>
      Row.fromSeq(r.zip(schema.fields).map { case (v, f) =>
        v.map(PgWire.parseWire(_, f.dataType)).orNull
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava), schema)
  }

  /** SQL literal for an INSERT statement (types from the schema):
    * strings/timestamps/dates quoted with '' escaping, numerics and
    * booleans raw, null → NULL. */
  private def literal(v: Option[String], dt: DataType): String = v match {
    case None => "NULL"
    case Some(s) => dt match {
      case StringType | TimestampType | DateType =>
        "'" + s.replace("'", "''") + "'"
      case _ => s
    }
  }

  /** One table through the wire: CREATE TABLE with `idCol SERIAL
    * PRIMARY KEY` (the id column DROPPED from the load so the SERVER
    * assigns it), the first `returningProbe` rows inserted with
    * `INSERT … RETURNING idCol` — each returned id REQUIRED equal to
    * the engine's — the remainder bulk-loaded via COPY (serial
    * continuation across the protocol switch), then the whole table
    * read back over a wire SELECT as a typed frame in `df`'s column
    * order. `df` must be ordered by `idCol` with dense ids 1..N. */
  def writeTable(c: PgLiteClient, df: DataFrame, schemaName: String,
                 table: String, idCol: String, unique: Seq[String] = Nil,
                 fks: Map[String, String] = Map.empty,
                 returningProbe: Int = 3): DataFrame =
    writeTableWithRows(c, df, schemaName, table, idCol, unique, fks,
      returningProbe)._1

  /** [[writeTable]] returning BOTH the typed read-back frame and the
    * engine frame's wire-text rows it already collected (column order
    * `idCol` followed by the data columns) — so callers that verify the
    * read-back against the source frame reuse the one collect instead
    * of collecting the engine frame a second time. */
  def writeTableWithRows(c: PgLiteClient, df: DataFrame, schemaName: String,
                 table: String, idCol: String, unique: Seq[String] = Nil,
                 fks: Map[String, String] = Map.empty,
                 returningProbe: Int = 3): (DataFrame, Seq[Seq[Option[String]]]) = {
    val dataFields = df.schema.fields.filter(_.name != idCol).toSeq
    val ddl = Sinks.createTableDdl(StructType(dataFields), schemaName, table,
      serialPk = Some(idCol), unique = unique, foreignKeys = fks)
    require(c.query(ddl).tags == Seq("CREATE TABLE"), s"DDL failed for $table")
    val dataCols = dataFields.map(_.name)
    val rows = textRows(df, idCol +: dataCols)
    val probe = rows.take(returningProbe)
    // the reference's id_mapping pattern, live: per-row RETURNING ids
    // must reproduce the engine's dense ordered assignment
    probe.foreach { r =>
      val vals = r.tail.zip(dataFields)
        .map { case (v, f) => literal(v, f.dataType) }.mkString(", ")
      val ret = c.query(s"INSERT INTO $schemaName.$table " +
        s"(${dataCols.mkString(", ")}) VALUES ($vals) RETURNING $idCol")
      require(ret.rows.head.head == r.head,
        s"$table: SERIAL id ${ret.rows.head.head} != engine id ${r.head}")
    }
    // the batched posture: COPY, with the serial continuing seamlessly
    val rest = rows.drop(returningProbe).map(_.tail)
    if (rest.nonEmpty) {
      val tag = c.copyIn(
        s"COPY $schemaName.$table (${dataCols.mkString(", ")}) FROM STDIN", rest)
      require(tag == s"COPY ${rest.length}", s"$table: unexpected tag $tag")
    }
    val back = c.query(s"SELECT ${df.columns.mkString(", ")} " +
      s"FROM $schemaName.$table ORDER BY $idCol")
    (fromWire(df.sparkSession, back.rows, df.schema), rows)
  }

  /** A distributed fact write: the server-confirmed published row
    * count and the sampled, ordered, typed head read-back. */
  final case class FactWrite(total: Long, head: DataFrame)

  /** The MAIN table at the CORPUS size class (round-17, VERDICT r16
    * task 1 — [[writeTable]]'s driver-side path is right for dims but
    * the reference's main table, `gold.property` at dag :430-447, is
    * one row per input row after key-dedup, so its main leg was a
    * corpus-sized driver collect at 100×):
    *
    *  1. DDL with `idCol SERIAL PRIMARY KEY` + FKs, as [[writeTable]];
    *  2. the k-row RETURNING PROBE — the first `returningProbe` rows
    *     in engine-id order insert row-at-a-time with `INSERT …
    *     RETURNING idCol`, each server-assigned id REQUIRED equal to
    *     the engine's (the reference's id_mapping fidelity, dag :478;
    *     the ONLY driver-side rows);
    *  3. the REMAINDER bulk-loads WITH EXPLICIT ids through
    *     [[PgWire.copyDistributedExactlyOnce]] — one wire connection
    *     per partition, per-attempt stages, one-transaction publish;
    *  4. `SELECT setval('<table>_<idCol>_seq', N)` — the published PG
    *     idiom after an explicit-id bulk load (COPY never advances
    *     the sequence), so the NEXT live insert continues at N+1
    *     exactly as the all-server-assigned path would;
    *  5. verification is FULLY distributed, the facts' discipline:
    *     server-confirmed count plus signed-count multiset equality
    *     over a [[PgWire.readDistributed]] re-scan of every row.
    *
    * Returns the DISTRIBUTED wire read-back frame (per-key-range
    * connections, streaming rows) — nothing corpus-sized ever touches
    * the driver on either direction. `df` must carry dense engine ids
    * 1..N in `idCol`. The frame is lazy: consume it while the
    * endpoint is alive. */
  def writeMainDistributed(c: PgLiteClient, df: DataFrame,
                           host: String, port: Int,
                           schemaName: String, table: String, idCol: String,
                           unique: Seq[String] = Nil,
                           fks: Map[String, String] = Map.empty,
                           returningProbe: Int = 3): DataFrame = {
    val dataFields = df.schema.fields.filter(_.name != idCol).toSeq
    val ddl = Sinks.createTableDdl(StructType(dataFields), schemaName, table,
      serialPk = Some(idCol), unique = unique, foreignKeys = fks)
    require(c.query(ddl).tags == Seq("CREATE TABLE"), s"DDL failed for $table")
    val dataCols = dataFields.map(_.name)
    val allCols = idCol +: dataCols
    // probe + count + COPY + verification all consume the frame
    val cached = df.persist()
    try {
      val total = cached.count()
      // (2) the id_mapping probe — k rows, the only driver-side leg
      val probe = textRows(
        cached.orderBy(col(idCol)).limit(returningProbe), allCols)
      probe.foreach { r =>
        val vals = r.tail.zip(dataFields)
          .map { case (v, f) => literal(v, f.dataType) }.mkString(", ")
        val ret = c.query(s"INSERT INTO $schemaName.$table " +
          s"(${dataCols.mkString(", ")}) VALUES ($vals) RETURNING $idCol")
        require(ret.rows.head.head == r.head,
          s"$table: SERIAL id ${ret.rows.head.head} != engine id ${r.head}")
      }
      val k = probe.length.toLong
      // (3) the corpus-sized remainder, distributed and exactly-once,
      // WITH explicit ids (dense 1..N, so id > k IS the remainder)
      if (total > k) {
        val rest = cached.filter(col(idCol) > k)
          .select(allCols.map(col): _*)
        // rowsHint (r18): the connection count scales with the corpus
        // toward rowsPerConnection instead of a fixed 8 — the count is
        // already in hand from the verification pass
        val published = PgWire.copyDistributedExactlyOnce(
          rest, host, port, s"$schemaName.$table",
          rowsHint = Some(total - k))
        require(published == total - k,
          s"$table: published $published rows, expected ${total - k}")
      }
      // (4) sequence continuation past the explicit-id load
      val sv = c.query(
        s"SELECT setval('$schemaName.${table}_${idCol}_seq', $total)")
      require(sv.rows.head.head.contains(total.toString),
        s"$table: setval echoed ${sv.rows.head.head}, expected $total")
      // (5) signed-count multiset equality over a full distributed
      // re-scan — the facts' one-pass check (see writeFactDistributed)
      val back = PgWire.readDistributed(df.sparkSession, host, port,
        s"$schemaName.$table", df.schema, idCol)
      val signed = cached.select(allCols.map(col): _*)
        .withColumn("__sign", lit(1L))
        .unionAll(back.select(allCols.map(col): _*)
          .withColumn("__sign", lit(-1L)))
      val mismatched = signed.groupBy(allCols.map(col): _*)
        .agg(sum(col("__sign")).as("__d"))
        .filter(col("__d") =!= 0L).count()
      require(mismatched == 0L,
        s"$table: wire read-back differs from the engine frame " +
          s"($mismatched distinct rows with unbalanced counts)")
      back
    } finally { cached.unpersist(); () }
  }

  /** A fact table (no surrogate id of its own), written at the FACT
    * size class (VERDICT r15 task 1): DDL on the driver connection,
    * rows through [[PgWire.copyDistributedExactlyOnce]] — one wire
    * connection per partition COPYing into per-attempt staging tables,
    * published in one transaction — so corpus-sized facts never
    * collect to the driver. FKs are enforced live by the server when
    * the publish's `INSERT … SELECT` lands in the constrained target.
    *
    * Verification is FULLY distributed (round-16: the sampled-head
    * compromise retired once [[PgWire.readDistributed]] existed):
    * (1) the server-confirmed published total must equal the engine's
    * `df.count()`; (2) EVERY row reads back through per-key-range wire
    * scans and the two frames must be MULTISET-equal (signed-count
    * grouping over all columns, one pass — `orderCol` need not be
    * unique: the star's fact tables carry several rows per main id,
    * which a key-join compare would cross-multiply) — nothing
    * table-sized on the driver at any scale. The RESULT surface stays the sampled head — `ORDER BY
    * orderCol LIMIT sampleK` over the wire — typed back into `df`'s
    * schema, so gate hashes are unchanged by the stronger check.
    * `orderCol` must be a non-null integer column; unique makes the
    * head deterministic (the flagship's facts key on o_orderkey). */
  def writeFactDistributed(c: PgLiteClient, df: DataFrame,
                           host: String, port: Int,
                           schemaName: String, table: String,
                           fks: Map[String, String],
                           orderCol: String, sampleK: Int = 100): FactWrite = {
    val ddl = Sinks.createTableDdl(df.schema, schemaName, table,
      serialPk = None, unique = Nil, foreignKeys = fks)
    require(c.query(ddl).tags == Seq("CREATE TABLE"), s"DDL failed for $table")
    val cols = df.columns.toSeq
    // the COPY, the expected count, and the full-equality join all
    // consume the fact frame: cache across the passes, release after
    val cached = df.persist()
    val total =
      try {
        // count FIRST (it is needed for verification regardless) so the
        // COPY's connection count can scale with it (r18)
        val expected = cached.count()
        val published = PgWire.copyDistributedExactlyOnce(
          cached, host, port, s"$schemaName.$table",
          rowsHint = Some(expected))
        require(published == expected,
          s"$table: server confirmed $published rows, engine expected $expected")
        val back = PgWire.readDistributed(df.sparkSession, host, port,
          s"$schemaName.$table", df.schema, orderCol, numPartitions = 8)
        // signed-count multiset equality in ONE pass: +1 per engine
        // row, -1 per wire row, grouped on every column — any group
        // with a nonzero sum is a row the round trip lost, duplicated,
        // or altered. One wire scan + one shuffle (exceptAll × 2 would
        // re-scan the table over the wire twice and shuffle twice).
        val signed = cached.select(cols.map(col): _*)
          .withColumn("__sign", lit(1L))
          .unionAll(back.select(cols.map(col): _*)
            .withColumn("__sign", lit(-1L)))
        val mismatched = signed.groupBy(cols.map(col): _*)
          .agg(sum(col("__sign")).as("__d"))
          .filter(col("__d") =!= 0L).count()
        require(mismatched == 0L,
          s"$table: wire read-back differs from the engine frame " +
            s"($mismatched distinct rows with unbalanced counts)")
        published
      } finally { cached.unpersist(); () }
    val back = c.query(s"SELECT ${cols.mkString(", ")} " +
      s"FROM $schemaName.$table ORDER BY $orderCol LIMIT $sampleK")
    FactWrite(total, fromWire(df.sparkSession, back.rows, df.schema))
  }

  /** The whole gold star through the wire, in FK dependency order:
    * dims (SERIAL + RETURNING + COPY, driver-side — dims are small by
    * construction) → main (FK→dim keys; CORPUS-sized in the
    * reference's star, so it rides [[writeMainDistributed]]'s
    * probe + exactly-once explicit-id COPY + setval path, r17) →
    * facts (input-sized: DISTRIBUTED exactly-once COPY with count
    * verification). Returns the wire read-back per table — full
    * driver frames for dims, the DISTRIBUTED lazy scan frame for
    * main, the sampled ordered head for facts. */
  def writeGold(c: PgLiteClient, gold: Map[String, DataFrame],
                spec: Medallion.GoldSpec, host: String, port: Int,
                schemaName: String = "gold",
                factSampleK: Int = 100): Map[String, DataFrame] = {
    c.query(Sinks.createSchemaDdl(schemaName))
    val id = spec.surrogateIdCol
    val dims = spec.dimKeyCols.keys.toSeq.sorted.map { d =>
      d -> writeTable(c, gold(d).orderBy(col(id)), schemaName, d, id,
        unique = Seq(s"${d}_key"))
    }
    val mainFks = spec.dimKeyCols.keys.map(d =>
      s"${d}_key" -> s"$schemaName.$d(${d}_key)").toMap
    val main = writeMainDistributed(c, gold(spec.mainTable), host, port,
      schemaName, spec.mainTable, id, unique = Nil, fks = mainFks)
    val factNames = gold.keySet -- spec.dimKeyCols.keySet - spec.mainTable
    val facts = factNames.toSeq.sorted.map { f =>
      f -> writeFactDistributed(c, gold(f), host, port, schemaName, f,
        fks = Map(s"${spec.mainTable}_id" ->
          s"$schemaName.${spec.mainTable}($id)"),
        orderCol = s"${spec.mainTable}_id", sampleK = factSampleK).head
    }
    (dims ++ facts :+ (spec.mainTable -> main)).toMap
  }
}
