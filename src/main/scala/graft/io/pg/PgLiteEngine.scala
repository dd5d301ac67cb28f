package graft.io.pg

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** In-memory relational backend for [[PgLiteServer]] — the RUNTIME
  * semantics of the reference's Postgres leg
  * (dags/dag_etl_minio_to_postgres.py:296-360 silver DDL+insert,
  * :413-595 gold): `CREATE SCHEMA/TABLE` with `SERIAL PRIMARY KEY`,
  * `UNIQUE` and `FOREIGN KEY` constraints, parameterless `INSERT …
  * VALUES … [RETURNING col]` with DB-side serial assignment (the
  * reference captures the RETURNING id into `id_mapping`, :134-136),
  * `INSERT … SELECT` (the staged-publish append), `SELECT … FROM t
  * [ORDER BY c] [LIMIT n]`, and the aggregate form `SELECT [g,]
  * count(*)|count(c)|sum(c)|min(c)|max(c) … FROM t [WHERE …]
  * [GROUP BY g]` (what Spark's DSv2 aggregate pushdown emits — one
  * row per group crosses the wire). Exactly the statement surface
  * [[graft.io.Sinks.createTableDdl]]/[[graft.io.Sinks.createSchemaDdl]]
  * emit plus the reference's insert/read-back patterns — not a SQL
  * engine; anything outside that surface raises a Postgres-coded
  * error (42601 syntax) rather than guessing.
  *
  * Transactions (round-16, reference :110-121 transactional DDL and
  * :138 single-commit insert loop): BEGIN/COMMIT/ROLLBACK with
  * statement-level semantics. Inside BEGIN, every table the session
  * mutates is copied-on-first-write into the session's [[PgTx]]
  * overlay; all statements in the transaction read/write the overlay
  * (read-your-writes) while OTHER connections keep seeing the base
  * until COMMIT atomically swaps the overlay in. ROLLBACK discards the
  * overlay. DDL is transactional like real Postgres (a CREATE TABLE
  * rolls back; a DROP TABLE is deferred to commit). SEQUENCES ARE NOT:
  * a rolled-back INSERT leaves a serial gap, exactly like Postgres
  * (the overlay's advanced `nextSerial` is pushed back to the base on
  * rollback). A failed statement aborts the transaction: every later
  * statement except COMMIT/ROLLBACK answers 25P02, and COMMIT of an
  * aborted transaction rolls back (tag "ROLLBACK"), all per the
  * published Postgres behavior.
  *
  * Concurrency: single-writer-per-table during a transaction is
  * assumed (the reference IS one psycopg2 process; COMMIT's swap would
  * lose a concurrent non-transactional append to the same table made
  * after the copy). Non-transactional statements keep the original
  * per-table-lock semantics and interleave safely.
  *
  * Error codes mirror Postgres: 23505 unique_violation, 23503
  * foreign_key_violation, 42P01 undefined_table, 42601 syntax_error,
  * 25P02 in_failed_sql_transaction.
  */
object PgLiteEngine {
  final case class Col(name: String, pgType: String, serial: Boolean,
                       unique: Boolean, references: Option[(String, String)])
  final class Table(val name: String, val cols: Seq[Col]) {
    val rows = mutable.ArrayBuffer[Array[String]]() // text-format values; null = SQL NULL
    var nextSerial = 1L
  }
  final case class PgError(code: String, message: String)
      extends RuntimeException(message)
  /** Result of one statement: optional row set + command tag. */
  final case class Result(columns: Seq[Col], rows: Seq[Array[String]], tag: String)

  /** COPY statement format: text, PGCOPY binary, or CSV. On the wire
    * only binary sets the CopyIn/CopyOutResponse format byte — CSV is
    * a flavor of the text format in the protocol. */
  sealed trait CopyFormat
  case object FmtText extends CopyFormat
  case object FmtBinary extends CopyFormat
  case object FmtCsv extends CopyFormat

  /** One WHERE predicate of the engine grammar — a comparison
    * `col (>=|<=|<|>|=) literal`, `col IN (…)`, `col LIKE '…'`, or
    * `col IS [NOT] NULL`. Companion-level so the DSv2 source can
    * VALIDATE its `where` option against the grammar at option-parse
    * time (r19, ADVICE r18): the option text is ANDed verbatim with
    * range predicates, so against a REAL PostgreSQL an OR would bind
    * tighter than the range bounds and silently duplicate rows across
    * partitions — rejecting anything outside the conjunctive grammar
    * up front closes that hole for every backend. */
  private[pg] val PredPat =
    "[\\w]+\\s*(?:(?:>=|<=|<|>|=)\\s*(?:'[^']*'|[\\w.+-]+)" +
      "|IN\\s*\\((?:'[^']*'|[^()'])*\\)" +
      "|LIKE\\s+'[^']*'" +
      "|IS\\s+(?:NOT\\s+)?NULL)"
  private val ConjunctiveWhereRe =
    s"(?is)^\\s*$PredPat(?:\\s+AND\\s+$PredPat)*\\s*$$".r

  /** Is `s` a pure AND-conjunction of the engine's WHERE predicates —
    * the only shape that composes safely (associatively, without
    * parentheses) with a partitioned scan's range bounds? */
  def isConjunctiveWhere(s: String): Boolean =
    ConjunctiveWhereRe.findFirstIn(s).isDefined

  /** Per-connection transaction state ([[PgLiteServer]] allocates one
    * per wire session). Rows appended to a copied table are fresh
    * arrays and existing row arrays are never mutated in place, so the
    * copy shares row references with the base safely. */
  final class PgTx {
    private[pg] var active = false
    private[pg] var aborted = false
    /** CancelRequest plumbing (r19): the server raises
      * `cancelRequested` when a matching out-of-band cancel arrives
      * while `executing`; the engine's cancellation points consume it
      * as SQLSTATE 57014. Connection-level, NOT transaction state —
      * [[reset]] leaves both untouched. */
    private[pg] val cancelRequested =
      new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile private[pg] var executing = false
    /** Tables touched (copy-on-first-write) or created in this tx. */
    private[pg] val copies = mutable.LinkedHashMap[String, Table]()
    /** Names in `copies` that were CREATEd inside the tx (no base). */
    private[pg] val created = mutable.LinkedHashSet[String]()
    private[pg] val createdSchemas = mutable.LinkedHashSet[String]()
    /** Base tables DROPped inside the tx (removal deferred to commit). */
    private[pg] val dropped = mutable.LinkedHashSet[String]()
    private[pg] def reset(): Unit = {
      active = false; aborted = false
      copies.clear(); created.clear(); createdSchemas.clear(); dropped.clear()
    }
    def inTransaction: Boolean = active
    def isAborted: Boolean = aborted
  }
}

final class PgLiteEngine {
  import PgLiteEngine._

  private val schemas = ConcurrentHashMap.newKeySet[String]()
  private val tables = new ConcurrentHashMap[String, Table]()

  /** Postgres type OIDs for the text-format wire row description. */
  def oidOf(pgType: String): Int = {
    val t = pgType.toUpperCase.takeWhile(c => c.isLetter || c == ' ').trim
    t match {
      case "TEXT" | "VARCHAR" | "CHAR" => 25
      case "INTEGER" | "INT" | "SERIAL" => 23
      case "BIGINT" => 20
      case "NUMERIC" | "DECIMAL" => 1700
      case "DOUBLE PRECISION" => 701
      case "BOOLEAN" => 16
      case "TIMESTAMP" => 1114
      case "DATE" => 1082
      case "BYTEA" => 17
      case _ => 25
    }
  }

  /** Postgres type modifier for the wire row description: NUMERIC(p,s)
    * carries `((p << 16) | s) + 4` (the documented VARHDRSZ-offset
    * atttypmod), everything else -1 — so a wire client can recover the
    * exact declared decimal type, like a real PG server. */
  def typmodOf(pgType: String): Int = {
    val m = "(?i)^(?:NUMERIC|DECIMAL)\\s*\\((\\d+)\\s*,\\s*(\\d+)\\)".r
      .findFirstMatchIn(pgType.trim)
    m.map(x => ((x.group(1).toInt << 16) | x.group(2).toInt) + 4).getOrElse(-1)
  }

  /** Autocommit entry point (direct engine callers, e.g. specs). */
  def execute(sql0: String): Result = execute(sql0, null)

  /** Monotone count of statements THIS ENGINE INSTANCE executed (one
    * engine per server; spawn multiple servers and each counts alone) —
    * lets specs and scale rehearsals COUNT round trips (r19, VERDICT
    * r18 task 4: the streaming source must amortize its planning
    * probes; the counter is how that is asserted rather than
    * eyeballed). Never reset; callers diff before/after. */
  val statementCount = new java.util.concurrent.atomic.AtomicLong

  def execute(sql0: String, tx: PgTx): Result = {
    statementCount.incrementAndGet()
    val sql = sql0.trim.stripSuffix(";").trim
    val up = sql.toUpperCase
    // transaction control resolves FIRST: COMMIT/ROLLBACK must work
    // (and BEGIN must no-op) inside an aborted transaction
    if (up == "BEGIN" || up == "START TRANSACTION") begin(tx)
    else if (up == "COMMIT" || up == "END") commit(tx)
    else if (up == "ROLLBACK" || up == "ABORT") rollback(tx)
    else if (tx != null && tx.active && tx.aborted)
      throw PgError("25P02", "current transaction is aborted, " +
        "commands ignored until end of transaction block")
    else if (up.startsWith("CREATE SCHEMA")) createSchema(sql, tx)
    else if (up.startsWith("CREATE TABLE")) createTable(sql, tx)
    else if (up.startsWith("INSERT INTO")) insert(sql, tx)
    else if ("(?is)^SELECT\\s+SETVAL\\s*\\(".r.findFirstIn(sql).isDefined)
      setval(sql, tx)
    else if ("(?is)^SELECT\\s+PG_SLEEP\\s*\\(".r.findFirstIn(sql).isDefined)
      pgSleep(sql, tx)
    else if (up.startsWith("SELECT")) select(sql, tx)
    else if (up.startsWith("DROP TABLE")) dropTable(sql, tx)
    else throw PgError("42601", s"unsupported statement: ${sql.take(60)}")
  }

  /** Cancellation point (r19, VERDICT r18 task 5): consume a pending
    * out-of-band CancelRequest as real PG does — SQLSTATE 57014,
    * statement aborted, connection (and transaction abort semantics)
    * intact. Called at the long-running loops: [[pgSleep]]'s wait and
    * every 8192 scanned rows of a SELECT. */
  private def checkCancel(tx: PgTx): Unit =
    if (tx != null && tx.cancelRequested.getAndSet(false))
      throw PgError("57014", "canceling statement due to user request")

  /** `SELECT pg_sleep(seconds)` — the published PG sleep function, the
    * deterministic long-running statement a cancellation test needs
    * (and the only statement here whose runtime is input-controlled).
    * Sleeps in small slices so a CancelRequest lands promptly. */
  private def pgSleep(sql: String, tx: PgTx): Result = {
    val m = "(?is)^SELECT\\s+pg_sleep\\s*\\(\\s*(\\d+(?:\\.\\d+)?)\\s*\\)\\s*$".r
      .findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad pg_sleep: ${sql.take(60)}"))
    val deadline = System.nanoTime + (m.group(1).toDouble * 1e9).toLong
    while (System.nanoTime < deadline) {
      checkCancel(tx)
      Thread.sleep(5)
    }
    checkCancel(tx)
    // real PG: pg_sleep returns one void row, rendered as empty text
    Result(Seq(Col("pg_sleep", "TEXT", serial = false, unique = false, None)),
      Seq(Array("")), "SELECT 1")
  }

  /** `SELECT setval('<table>_<col>_seq', v)` — the published PG idiom
    * a production bulk load runs after COPYing rows WITH explicit
    * serial ids (COPY never advances the sequence, so the next
    * INSERT…RETURNING would collide without it). Semantics per PG:
    * the next serial drawn is `v + 1`; NON-transactional (a rollback
    * does not undo it), like the sequences themselves. The sequence
    * name resolves against the catalog using PG's serial naming
    * convention — table and column names may themselves contain '_',
    * so every split point is tried, rightmost first. */
  private def setval(sql: String, tx: PgTx): Result = {
    val m = ("(?is)^SELECT\\s+setval\\s*\\(\\s*'([\\w.]+)'\\s*,\\s*" +
      "(\\d+)\\s*\\)\\s*$").r.findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad setval: ${sql.take(60)}"))
    val seq = m.group(1).toLowerCase
    val v = m.group(2).toLong
    if (!seq.endsWith("_seq"))
      throw PgError("42P01", s"sequence \"$seq\" does not exist")
    val base = seq.stripSuffix("_seq")
    val t = base.zipWithIndex.collect { case ('_', i) =>
        (base.substring(0, i), base.substring(i + 1))
      }.reverseIterator.flatMap { case (tn, cn) =>
        lookup(tn, tx).filter(_.cols.exists(c => c.serial && c.name == cn))
      }.nextOption()
      .getOrElse(throw PgError("42P01", s"sequence \"$seq\" does not exist"))
    t.synchronized { t.nextSerial = v + 1 }
    // write through to the base under a transaction overlay: sequence
    // state is shared across sessions immediately, like real PG
    if (tx != null && tx.active)
      Option(tables.get(t.name)).foreach { b =>
        b.synchronized { b.nextSerial = v + 1 }
      }
    Result(Seq(Col("setval", "BIGINT", serial = false, unique = false, None)),
      Seq(Array(v.toString)), "SELECT 1")
  }

  // ---- transaction control -------------------------------------------------

  private def begin(tx: PgTx): Result = {
    if (tx == null)
      throw PgError("0A000", "BEGIN requires a wire session")
    // BEGIN inside a transaction: Postgres warns and no-ops
    if (!tx.active) tx.active = true
    Result(Nil, Nil, "BEGIN")
  }

  private def commit(tx: PgTx): Result = {
    if (tx == null || !tx.active) return Result(Nil, Nil, "COMMIT")
    if (tx.aborted) { rollbackWork(tx); return Result(Nil, Nil, "ROLLBACK") }
    // atomic publish: drops, then overlay swap-ins, under one lock so
    // a concurrent reader sees either none or all of the transaction
    tables.synchronized {
      tx.createdSchemas.foreach(schemas.add)
      tx.dropped.foreach(tables.remove)
      tx.copies.foreach { case (n, t) => tables.put(n, t) }
    }
    tx.reset()
    Result(Nil, Nil, "COMMIT")
  }

  private def rollback(tx: PgTx): Result = {
    if (tx != null && tx.active) rollbackWork(tx)
    Result(Nil, Nil, "ROLLBACK")
  }

  /** Discard the overlay. Sequences are NON-transactional (real PG):
    * serial advances made inside the tx survive as gaps. */
  private def rollbackWork(tx: PgTx): Unit = {
    tx.copies.foreach { case (n, copy) =>
      if (!tx.created.contains(n)) {
        val base = tables.get(n)
        if (base != null) base.synchronized {
          if (copy.nextSerial > base.nextSerial)
            base.nextSerial = copy.nextSerial
        }
      }
    }
    tx.reset()
  }

  // ---- catalog resolution (transaction-aware) ------------------------------

  /** The session's view of a table: overlay copy if present, base
    * unless dropped in this tx. */
  private def lookup(name: String, tx: PgTx): Option[Table] =
    if (tx != null && tx.active)
      tx.copies.get(name).orElse(
        if (tx.dropped.contains(name)) None else Option(tables.get(name)))
    else Option(tables.get(name))

  /** Resolve for a statement; `forWrite` inside a transaction copies
    * the base table into the overlay on first touch. */
  /** `information_schema.tables` — the PG catalog view a client needs
    * to DISCOVER tables (the V2 sink's orphan-stage janitor sweeps it
    * by name prefix: a hard-killed task's attempt-unique stage table
    * would otherwise leak forever, since later runs' attempt ids never
    * match it). Read-only, synthesized per query: base catalog plus
    * the session's in-transaction creates, minus its pending drops. */
  private def infoSchemaTables(tx: PgTx): Table = {
    val t = new Table("information_schema.tables",
      Seq(Col("table_schema", "TEXT", serial = false, unique = false, None),
        Col("table_name", "TEXT", serial = false, unique = false, None)))
    val names = mutable.SortedSet.empty[String]
    names ++= tables.keySet.asScala
    if (tx != null && tx.active) {
      names ++= tx.created
      names --= tx.dropped
    }
    names.foreach { n =>
      val Array(sch, bare) = n.split("\\.", 2) match {
        case a @ Array(_, _) => a
        case _ => Array("public", n)
      }
      t.rows += Array(sch, bare)
    }
    t
  }

  private def resolve(name: String, tx: PgTx, forWrite: Boolean): Table = {
    if (name == "information_schema.tables") {
      if (forWrite)
        throw PgError("42501", "information_schema.tables is read-only")
      return infoSchemaTables(tx)
    }
    val t = lookup(name, tx)
      .getOrElse(throw PgError("42P01", s"relation \"$name\" does not exist"))
    if (forWrite && tx != null && tx.active && !tx.copies.contains(name)) {
      t.synchronized {
        val copy = new Table(name, t.cols)
        copy.rows ++= t.rows
        copy.nextSerial = t.nextSerial
        tx.copies.put(name, copy)
        copy
      }
    } else t
  }

  private def schemaExists(name: String, tx: PgTx): Boolean =
    schemas.contains(name) ||
      (tx != null && tx.active && tx.createdSchemas.contains(name))

  // ---- DDL ----------------------------------------------------------------

  private def createSchema(sql: String, tx: PgTx): Result = {
    val m = "(?i)CREATE\\s+SCHEMA\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([A-Za-z_][\\w]*)".r
      .findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad CREATE SCHEMA: $sql"))
    val name = m.group(2).toLowerCase
    val exists = schemaExists(name, tx)
    if (exists && m.group(1) == null)
      throw PgError("42P06", s"schema \"$name\" already exists")
    if (!exists) {
      if (tx != null && tx.active) tx.createdSchemas.add(name)
      else schemas.add(name)
    }
    Result(Nil, Nil, "CREATE SCHEMA")
  }

  /** Split a parenthesized column list on top-level commas (NUMERIC(5,2)
    * carries nested commas). */
  private def topLevelSplit(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def createTable(sql: String, tx: PgTx): Result = {
    val m = ("(?is)CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      "([\\w]+(?:\\.[\\w]+)?)\\s*\\((.*)\\)\\s*$").r.findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad CREATE TABLE: ${sql.take(60)}"))
    val name = m.group(2).toLowerCase
    name.split("\\.") match {
      case Array(sch, _) if !schemaExists(sch, tx) =>
        throw PgError("3F000", s"schema \"$sch\" does not exist")
      case _ => ()
    }
    if (lookup(name, tx).isDefined) {
      if (m.group(1) != null) return Result(Nil, Nil, "CREATE TABLE")
      throw PgError("42P07", s"relation \"$name\" already exists")
    }
    val cols = topLevelSplit(m.group(3)).map(parseCol(name, _, tx))
    val t = new Table(name, cols)
    if (tx != null && tx.active) {
      tx.copies.put(name, t)
      tx.created.add(name)
    } else tables.put(name, t)
    Result(Nil, Nil, "CREATE TABLE")
  }

  private def parseCol(table: String, defn: String, tx: PgTx): Col = {
    val fkM = "(?i)REFERENCES\\s+([\\w]+(?:\\.[\\w]+)?)\\s*\\(([\\w]+)\\)".r
      .findFirstMatchIn(defn)
    val fk = fkM.map(x => (x.group(1).toLowerCase, x.group(2).toLowerCase))
    fk.foreach { case (ft, _) =>
      if (lookup(ft, tx).isEmpty)
        throw PgError("42P01", s"relation \"$ft\" does not exist") }
    val unique = "(?i)\\bUNIQUE\\b".r.findFirstIn(defn).isDefined
    val head = defn.trim.split("\\s+", 2)
    val cname = head(0).toLowerCase
    val rest = if (head.length > 1) head(1) else ""
    val serial = "(?i)^SERIAL\\b".r.findFirstIn(rest.trim).isDefined
    val tpe =
      if (serial) "INTEGER"
      else rest.split("(?i)\\s+(UNIQUE|PRIMARY|REFERENCES|NOT)\\b")(0).trim
    Col(cname, if (tpe.isEmpty) "TEXT" else tpe, serial,
      unique || "(?i)PRIMARY\\s+KEY".r.findFirstIn(defn).isDefined, fk)
  }

  private def dropTable(sql: String, tx: PgTx): Result = {
    val m = "(?i)DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?([\\w]+(?:\\.[\\w]+)?)".r
      .findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad DROP TABLE: $sql"))
    val name = m.group(2).toLowerCase
    val exists = lookup(name, tx).isDefined
    if (!exists) {
      if (m.group(1) == null)
        throw PgError("42P01", s"relation \"$name\" does not exist")
      return Result(Nil, Nil, "DROP TABLE")
    }
    if (tx != null && tx.active) {
      if (tx.created.contains(name)) { // created in this tx: vanish
        tx.copies.remove(name); tx.created.remove(name)
      } else { // base table: hide now, remove at commit
        tx.copies.remove(name); tx.dropped.add(name)
      }
    } else tables.remove(name)
    Result(Nil, Nil, "DROP TABLE")
  }

  // ---- DML ----------------------------------------------------------------

  /** Literal SQL values: 'quoted' ('' escape), numbers, NULL, booleans. */
  private def parseValues(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = 0; val n = s.length
    while (i < n) {
      while (i < n && (s(i) == ' ' || s(i) == ',')) i += 1
      if (i < n) {
        if (s(i) == '\'') {
          val sb = new StringBuilder; i += 1
          var done = false
          while (!done) {
            if (i >= n) throw PgError("42601", "unterminated string literal")
            if (s(i) == '\'' && i + 1 < n && s(i + 1) == '\'') { sb.append('\''); i += 2 }
            else if (s(i) == '\'') { i += 1; done = true }
            else { sb.append(s(i)); i += 1 }
          }
          out += sb.toString
        } else {
          val j0 = i
          while (i < n && s(i) != ',') i += 1
          val tok = s.substring(j0, i).trim
          out += (if (tok.equalsIgnoreCase("NULL")) null else tok)
        }
      }
    }
    out.toSeq
  }

  private def insert(sql: String, tx: PgTx): Result = {
    // INSERT INTO t [(cols)] SELECT … — the staged-publish append
    // (PgWire.copyDistributedExactlyOnce moves each staged partition
    // into the target inside one transaction)
    val selM = ("(?is)INSERT\\s+INTO\\s+([\\w]+(?:\\.[\\w]+)?)\\s*" +
      "(?:\\(([^)]*)\\)\\s*)?(SELECT\\s.*)$").r.findFirstMatchIn(sql)
    if (selM.isDefined) {
      val m = selM.get
      val name = m.group(1).toLowerCase
      val sub = select(m.group(3), tx)
      val t = resolve(name, tx, forWrite = true)
      val cols = Option(m.group(2))
        .map(_.split(",").map(_.trim.toLowerCase).toSeq)
        .getOrElse(sub.columns.map(_.name))
      if (cols.length != sub.columns.length)
        throw PgError("42601",
          s"${cols.length} target columns, ${sub.columns.length} selected")
      return appendRows(t, cols, sub.rows.map(_.toSeq), tx,
        n => s"INSERT 0 $n")
    }
    val m = ("(?is)INSERT\\s+INTO\\s+([\\w]+(?:\\.[\\w]+)?)\\s*" +
      "\\(([^)]*)\\)\\s*VALUES\\s*\\((.*)\\)\\s*(RETURNING\\s+([\\w]+))?\\s*$").r
      .findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad INSERT: ${sql.take(60)}"))
    val name = m.group(1).toLowerCase
    val t = resolve(name, tx, forWrite = true)
    val colNames = m.group(2).split(",").map(_.trim.toLowerCase).toSeq
    val vals = parseValues(m.group(3))
    if (vals.length != colNames.length)
      throw PgError("42601", s"${colNames.length} columns, ${vals.length} values")
    val byName = colNames.zip(vals).toMap
    t.synchronized {
      val row = t.cols.map { c =>
        if (c.serial) { val v = t.nextSerial.toString; t.nextSerial += 1; v }
        else byName.getOrElse(c.name, null)
      }.toArray
      // constraint checks BEFORE the append (reference semantics: a
      // violated insert leaves the table unchanged)
      t.cols.zipWithIndex.foreach { case (c, i) =>
        if (c.unique && row(i) != null &&
            t.rows.exists(r => r(i) != null && r(i) == row(i)))
          throw PgError("23505",
            s"duplicate key value violates unique constraint on ${t.name}.${c.name}")
        c.references.foreach { case (ft, fc) =>
          val rt = lookup(ft, tx)
            .getOrElse(throw PgError("42P01", s"relation \"$ft\" does not exist"))
          val fi = rt.cols.indexWhere(_.name == fc)
          if (row(i) != null && !rt.rows.exists(r => r(fi) == row(i)))
            throw PgError("23503",
              s"insert on ${t.name} violates foreign key: ${c.name}=${row(i)} not in $ft.$fc")
        }
      }
      t.rows += row
      val ret = Option(m.group(5)).map(_.toLowerCase)
      ret match {
        case Some(rc) =>
          val i = t.cols.indexWhere(_.name == rc)
          if (i < 0) throw PgError("42703", s"column \"$rc\" does not exist")
          Result(Seq(t.cols(i)), Seq(Array(row(i))), "INSERT 0 1")
        case None => Result(Nil, Nil, "INSERT 0 1")
      }
    }
  }

  /** Result shape WITHOUT execution — what Describe(portal) answers in
    * the extended protocol: a SELECT's projected columns, an INSERT's
    * RETURNING column, empty (NoData) for everything else. Read-only:
    * resolves the catalog but touches no rows. */
  def describe(sql0: String, tx: PgTx): Seq[Col] = {
    val sql = sql0.trim.stripSuffix(";").trim
    val up = sql.toUpperCase
    if (up.startsWith("SELECT")) {
      // same routing as select(): an aggregate list or GROUP BY never
      // fits the plain grammar — Describe must agree with Execute
      SelectRe.findFirstMatchIn(sql) match {
        case Some(m) if !m.group(1).contains("(") =>
          val (_, cols, _) = selectShape(m, tx)
          cols
        case _ => aggShape(sql, tx)._2.map(_._4)
      }
    } else if (up.startsWith("INSERT INTO")) {
      "(?is)RETURNING\\s+([\\w]+)\\s*$".r.findFirstMatchIn(sql).toSeq.flatMap { m =>
        val name = "(?is)INSERT\\s+INTO\\s+([\\w]+(?:\\.[\\w]+)?)".r
          .findFirstMatchIn(sql).get.group(1).toLowerCase
        val rc = m.group(1).toLowerCase
        lookup(name, tx).toSeq.flatMap(_.cols.filter(_.name == rc))
      }
    } else Nil
  }

  /** The supported SELECT surface: projection, single table, optional
    * WHERE of ANY NUMBER of ANDed predicates — comparisons
    * `col (>=|<=|<|>|=) literal`, `col IN (lit, …)`, and
    * `col IS [NOT] NULL` (round-17, VERDICT r16 task 4 — two fixed
    * comparison slots meant a partitioned reader's key range consumed
    * the whole grammar and no user filter could ride alongside it;
    * `>= AND <` is the half-open range a PARTITIONED reader scans —
    * [[graft.io.pg.PgWire.readDistributed]] issues exactly this shape
    * per partition; `=` serves pushed point lookups), optional
    * `ORDER BY col [ASC|DESC] [NULLS FIRST|LAST]`, optional LIMIT.
    * Explicit NULLS placement (PG syntax) exists so a client whose
    * sort semantics differ from PG's defaults — Spark's ASC is
    * NULLS FIRST where PG's is NULLS LAST — can push an order the
    * engine reproduces exactly (the DSv2 TopN pushdown needs this). */
  private val PredPat = PgLiteEngine.PredPat // one grammar, one source
  private val WherePat =
    s"(?:\\s+WHERE\\s+($PredPat(?:\\s+AND\\s+$PredPat)*))?"
  private val OrderItemPat =
    "[\\w]+(?:\\s+(?:ASC|DESC))?(?:\\s+NULLS\\s+(?:FIRST|LAST))?"
  private val SelectRe =
    ("(?is)SELECT\\s+(.*?)\\s+FROM\\s+([\\w]+(?:\\.[\\w]+)?)" + WherePat +
      s"(?:\\s+ORDER\\s+BY\\s+($OrderItemPat(?:\\s*,\\s*$OrderItemPat)*))?" +
      "(?:\\s+LIMIT\\s+(\\d+))?\\s*$").r

  /** (col, desc, nullsFirst) per ORDER BY item of an already-validated
    * order list. NULL placement: PG defaults (ASC → LAST, DESC →
    * FIRST) unless the item says NULLS FIRST|LAST explicitly. */
  private val OrderItemRe =
    "(?i)([\\w]+)(?:\\s+(ASC|DESC))?(?:\\s+NULLS\\s+(FIRST|LAST))?".r
  private def parseOrder(list: String): Seq[(String, Boolean, Boolean)] =
    if (list == null) Nil
    else OrderItemRe.findAllMatchIn(list).map { m =>
      val desc = m.group(2) != null && m.group(2).equalsIgnoreCase("DESC")
      val nullsFirst = Option(m.group(3)) match {
        case Some(nf) => nf.equalsIgnoreCase("FIRST")
        case None => desc
      }
      (m.group(1).toLowerCase, desc, nullsFirst)
    }.toSeq

  /** (col, op, payload) triples of an already-validated WHERE clause
    * (the enclosing SelectRe/AggSelectRe anchored it to
    * `pred (AND pred)*`, so a per-predicate scan can't pick up junk —
    * quoted literals never contain a quote by the grammar, so a
    * literal can't swallow an AND). op is a comparison, `in` (payload
    * = the raw parenthesized list, parsed by [[parseValues]]),
    * `isnull`, or `notnull`. */
  private val PredRe =
    ("(?i)([\\w]+)\\s*(?:(>=|<=|<|>|=)\\s*('[^']*'|[\\w.+-]+)" +
      "|(IN)\\s*\\(((?:'[^']*'|[^()'])*)\\)" +
      "|(LIKE)\\s+'([^']*)'" +
      "|IS\\s+(NOT\\s+)?(NULL))").r
  private def parseWhere(clause: String): Seq[(String, String, String)] =
    if (clause == null) Nil
    else PredRe.findAllMatchIn(clause).map { m =>
      if (m.group(2) != null) (m.group(1), m.group(2), m.group(3))
      else if (m.group(4) != null) (m.group(1), "in", m.group(5))
      else if (m.group(6) != null) (m.group(1), "like", m.group(7))
      else (m.group(1), if (m.group(8) != null) "notnull" else "isnull", null)
    }.toSeq

  /** Catalog-resolve an already-matched plain SELECT (shared by
    * [[plainSelect]] and [[describe]] — both hold the Match, so the
    * statement is regex-parsed exactly once):
    * (table, projected cols, projection indices). */
  private def selectShape(m: scala.util.matching.Regex.Match,
                          tx: PgTx): (Table, Seq[Col], Seq[Int]) = {
    val name = m.group(2).toLowerCase
    val t = resolve(name, tx, forWrite = false)
    val (cols, proj) = m.group(1).trim match {
      case "*" => (t.cols, t.cols.indices.toSeq)
      case list =>
        val names = list.split(",").map(_.trim.toLowerCase).toSeq
        val idx = names.map { cn =>
          val i = t.cols.indexWhere(_.name == cn)
          if (i < 0) throw PgError("42703", s"column \"$cn\" does not exist")
          i
        }
        (idx.map(t.cols(_)), idx)
    }
    (t, cols, proj)
  }

  /** Typed comparison key for one column: integers as Long, float8 as
    * Double (parseDouble accepts NaN/Infinity, and Double.compare's
    * total order — NaN greatest — matches both PG's and Spark's float
    * ordering), decimals as BigDecimal, everything else (text, ISO
    * dates/timestamps) as UTF-8 bytes — the order Spark's UTF8String
    * uses, which differs from Java's UTF-16 `<` for supplementary-
    * plane characters (emoji vs U+E000..U+FFFF), and which a pushed
    * top-n/min/max partial must reproduce or it ships the wrong
    * per-range winners. */
  private def cmpKey(oid: Int, v: String): Any =
    if (oid == 23 || oid == 20) java.lang.Long.parseLong(v)
    else if (oid == 701) java.lang.Double.parseDouble(v)
    else if (oid == 1700) BigDecimal(v)
    else v
  /** Unsigned lexicographic UTF-8 byte order (Spark's string order). */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
  /** Wall-clock key for timestamp text — TZ-independent (LocalDateTime,
    * never java.sql's default-zone parse) and CANONICALIZING: a
    * hand-inserted '… 12:30:05' and a writer's '… 12:30:05.0' are the
    * same instant, so a pushed `=` must see them equal where raw text
    * bytes would not. Non-ISO text falls back to byte order. */
  private def tsKey(v: String): Either[String, java.time.LocalDateTime] =
    try Right(java.time.LocalDateTime.parse(v.replace(' ', 'T')))
    catch { case _: java.time.format.DateTimeParseException => Left(v) }
  private def dateKey(v: String): Either[String, java.time.LocalDate] =
    try Right(java.time.LocalDate.parse(v))
    catch { case _: java.time.format.DateTimeParseException => Left(v) }

  private def cmpVal(oid: Int, a: String, b: String): Int =
    if (oid == 23 || oid == 20)
      java.lang.Long.compare(
        java.lang.Long.parseLong(a), java.lang.Long.parseLong(b))
    else if (oid == 701) {
      // Spark's double semantics (SQLOrderingUtil): -0.0 == 0.0 (IEEE
      // ==) and NaN == NaN / NaN greatest (Double.compare)
      val (x, y) = (java.lang.Double.parseDouble(a),
        java.lang.Double.parseDouble(b))
      if (x == y) 0 else java.lang.Double.compare(x, y)
    }
    else if (oid == 1700) BigDecimal(a).compare(BigDecimal(b))
    else if (oid == 1114) (tsKey(a), tsKey(b)) match {
      case (Right(x), Right(y)) => x.compareTo(y)
      case _ => utf8Cmp(a, b)
    }
    else if (oid == 1082) (dateKey(a), dateKey(b)) match {
      case (Right(x), Right(y)) => x.compareTo(y)
      case _ => utf8Cmp(a, b)
    }
    else utf8Cmp(a, b)
  private def cmpLt(oid: Int, a: String, b: String): Boolean =
    cmpVal(oid, a, b) < 0

  /** WHERE predicates from (col, op, payload) triples — evaluated
    * against the FULL row (the filter column need not be projected);
    * SQL semantics: NULL never satisfies a comparison or IN (a NULL
    * list element can match nothing and is dropped); IS [NOT] NULL
    * tests nullness directly. */
  private def predFilter(t: Table,
      triples: Seq[(String, String, String)]): Array[String] => Boolean = {
    def colIdx(c: String): (Int, Int) = {
      val ci = t.cols.indexWhere(_.name == c.toLowerCase)
      if (ci < 0) throw PgError("42703", s"column \"$c\" does not exist")
      (ci, oidOf(t.cols(ci).pgType))
    }
    def validated(oid: Int, c: String, v: String): String = {
      try cmpKey(oid, v) // validates the literal's type eagerly
      catch { case _: NumberFormatException =>
        throw PgError("22P02", s"bad literal for \"$c\": $v") }
      v
    }
    val preds: Seq[Array[String] => Boolean] = triples.collect {
      case (c, "isnull", _) if c != null =>
        val (ci, _) = colIdx(c)
        (r: Array[String]) => r(ci) == null
      case (c, "notnull", _) if c != null =>
        val (ci, _) = colIdx(c)
        (r: Array[String]) => r(ci) != null
      case (c, "in", list) if c != null =>
        val (ci, oid) = colIdx(c)
        // parseValues unquotes and maps the NULL token to null; a
        // NULL element can never equate, so it drops (PG semantics)
        val vals = parseValues(list).filter(_ != null)
          .map(validated(oid, c, _))
        (r: Array[String]) =>
          r(ci) != null && vals.exists(v => cmpVal(oid, r(ci), v) == 0)
      case (c, "like", pat) if c != null =>
        val (ci, oid) = colIdx(c)
        if (oid != 25) // PG: LIKE is a text operator
          throw PgError("42883",
            s"operator does not exist: ${t.cols(ci).pgType} LIKE text")
        // SQL LIKE → anchored regex: % = any run, _ = any one char,
        // backslash escapes the next pattern char (PG's default
        // ESCAPE), everything else literal
        val sb = new StringBuilder("(?s)^")
        var i = 0
        while (i < pat.length) {
          pat.charAt(i) match {
            case '\\' if i + 1 < pat.length =>
              sb.append(java.util.regex.Pattern.quote(
                pat.charAt(i + 1).toString)); i += 2
            case '%' => sb.append(".*"); i += 1
            case '_' => sb.append("."); i += 1
            case ch =>
              sb.append(java.util.regex.Pattern.quote(ch.toString)); i += 1
          }
        }
        sb.append("$")
        val re = sb.toString.r
        (r: Array[String]) =>
          r(ci) != null && re.findFirstIn(r(ci)).isDefined
      case (c, op, lit) if c != null =>
        val (ci, oid) = colIdx(c)
        val v = validated(oid, c,
          if (lit.startsWith("'")) lit.substring(1, lit.length - 1) else lit)
        (r: Array[String]) => r(ci) != null && {
          val cmp = cmpVal(oid, r(ci), v)
          op match {
            case ">=" => cmp >= 0
            case ">" => cmp > 0
            case "<=" => cmp <= 0
            case "<" => cmp < 0
            case "=" => cmp == 0
          }
        }
    }
    r => preds.forall(_(r))
  }

  private def select(sql: String, tx: PgTx): Result =
    SelectRe.findFirstMatchIn(sql) match {
      // an aggregate select list (`count(*)`, `sum(c)`, …) or a GROUP
      // BY never fits the plain grammar — route to the aggregate path
      case Some(m) if !m.group(1).contains("(") => plainSelect(m, tx)
      case _ => aggSelect(sql, tx)
    }

  private def plainSelect(m: scala.util.matching.Regex.Match,
                          tx: PgTx): Result = {
    val (t, cols, proj) = selectShape(m, tx)
    t.synchronized {
      val keep0 = predFilter(t, parseWhere(m.group(3)))
      // cancellation point every 8k scanned rows (r19)
      var scanned = 0
      val keep = (r: Array[String]) => {
        scanned += 1
        if ((scanned & 8191) == 0) checkCancel(tx)
        keep0(r)
      }
      // filter and SORT over the full rows, project LAST — the ORDER
      // BY column need not be in the projection (real-PG semantics;
      // r17: `SELECT a FROM t ORDER BY id` previously 42703'd)
      var rows: Seq[Array[String]] =
        t.rows.toSeq.iterator.filter(keep).toSeq
      val limit = Option(m.group(5)).map(_.toInt)
      val order = parseOrder(m.group(4))
      if (order.nonEmpty) {
          // one (colIdx, oid, desc, nullsFirst) per ORDER BY item —
          // composed lexicographically. NULL placement: PG defaults
          // (ASC → LAST, DESC → FIRST) unless the item says NULLS
          // FIRST|LAST. NULLs are placed, never fed to numeric/String
          // comparison. Integer columns compare as Long (INT/BIGINT/
          // SERIAL store their canonical toString), decimals as
          // BigDecimal.
          val items = order.map { case (ob, desc, nullsFirst) =>
            val oi = t.cols.indexWhere(_.name == ob)
            if (oi < 0) throw PgError("42703", s"column \"$ob\" does not exist")
            (oi, oidOf(t.cols(oi).pgType), desc, nullsFirst)
          }
          val ord: Ordering[Array[String]] = (x: Array[String], y: Array[String]) => {
            var res = 0
            val it = items.iterator
            while (res == 0 && it.hasNext) {
              val (oi, oid, desc, nullsFirst) = it.next()
              val (a, b) = (x(oi), y(oi))
              res =
                if (a == null && b == null) 0
                else if (a == null) { if (nullsFirst) -1 else 1 }
                else if (b == null) { if (nullsFirst) 1 else -1 }
                else if (desc) -cmpVal(oid, a, b)
                else cmpVal(oid, a, b)
            }
            res
          }
          rows = limit match {
            case Some(0) => Seq.empty // legal LIMIT 0: no sort, no heap
            // ORDER BY + LIMIT n: a bounded top-k heap, not a full
            // sort — the sampled-head read-back (`ORDER BY c LIMIT k`)
            // must stay O(rows·log k) however large the table grows
            case Some(n) if n < rows.length =>
              val heap = new scala.collection.mutable.PriorityQueue[
                Array[String]]()(ord) // max-heap: root = worst kept row
              rows.foreach { r =>
                if (heap.size < n) heap.enqueue(r)
                else if (ord.lt(r, heap.head)) { heap.dequeue(); heap.enqueue(r) }
              }
              heap.dequeueAll.reverse.toSeq
            case _ => rows.sorted(ord)
          }
      }
      limit.foreach(n => rows = rows.take(n))
      val out = rows.map(r => proj.map(r(_)).toArray)
      Result(cols, out, s"SELECT ${out.length}")
    }
  }

  /** Aggregate SELECT surface: `SELECT [g,] count(*)|count(c)|sum(c)|
    * min(c)|max(c) [AS alias], … FROM t [WHERE …] [GROUP BY g]` —
    * exactly the shape Spark's DSv2 aggregate pushdown emits
    * ([[graft.io.pg.PgLiteDataSource]]): one output row per group (one
    * total without GROUP BY, even over zero input rows, per SQL), so a
    * partitioned reader ships group-count rows per connection instead
    * of the table. */
  // a GROUP BY item is a column, `col / N`, or `(col + S) / N` —
  // integer-division bucketing (r18): the ONE expression an equi-depth
  // range planner needs server-side (`SELECT k/W, count(*) … GROUP BY
  // k/W` returns the whole bucket histogram in one round trip, one row
  // per non-empty bucket, instead of N ranged count(*) probes).
  // Division truncates toward zero, PG's integer `/` semantics — which
  // is exactly why the shifted form exists (r19, VERDICT r18 wrong 2):
  // truncation is NOT floor on negatives, so a planner bucketing a
  // signed keyspace adds a non-negative offset first (`(k + S) / W`,
  // PG-legal arithmetic) to keep every bucketed value ≥ 0.
  private val GroupByItemPat =
    "(?:[\\w]+(?:\\s*/\\s*\\d+)?|\\(\\s*[\\w]+\\s*\\+\\s*\\d+\\s*\\)\\s*/\\s*\\d+)"
  private val AggSelectRe =
    ("(?is)SELECT\\s+(.+?)\\s+FROM\\s+([\\w]+(?:\\.[\\w]+)?)" + WherePat +
      s"(?:\\s+GROUP\\s+BY\\s+($GroupByItemPat(?:\\s*,\\s*$GroupByItemPat)*))?\\s*$$").r
  private val AggItemRe =
    "(?i)^(count|sum|min|max)\\s*\\(\\s*(\\*|[\\w]+)\\s*\\)(?:\\s+AS\\s+([\\w]+))?$".r
  // groups: (1 col, 2 div) plain/divided form; (3 col, 4 shift, 5 div)
  // shifted form `(col + S) / N`
  private val GroupItemRe =
    ("(?i)^(?:([\\w]+)(?:\\s*/\\s*(\\d+))?" +
      "|\\(\\s*([\\w]+)\\s*\\+\\s*(\\d+)\\s*\\)\\s*/\\s*(\\d+))$").r
  private val BareGroupRe =
    ("(?i)^(?:([\\w]+)(?:\\s*/\\s*(\\d+))?" +
      "|\\(\\s*([\\w]+)\\s*\\+\\s*(\\d+)\\s*\\)\\s*/\\s*(\\d+))" +
      "(?:\\s+AS\\s+([\\w]+))?$").r

  /** Parsed aggregate-select shape, shared by [[aggSelect]] and
    * [[describe]]: item = (fn, index, input oid, output Col) — for
    * aggregate items the index is the table column (-1 for `*`), for
    * `"group"` items it is the index INTO the groupCols list (r18:
    * group keys may be `col / N` bucket expressions, so the raw table
    * index no longer identifies them). A bare/divided column
    * reference is legal only when it IS one of the grouping
    * expressions (42803 otherwise). groupCols entry =
    * (table col idx, shift, divisor) for `(col + shift) / div` (shift
    * 0 for the unshifted forms, r19). */
  private def aggShape(sql: String, tx: PgTx)
      : (Table, Seq[(String, Int, Int, Col)],
         Option[Seq[(Int, Long, Option[Long])]],
         scala.util.matching.Regex.Match) = {
    val m = AggSelectRe.findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad SELECT: ${sql.take(60)}"))
    val t = resolve(m.group(2).toLowerCase, tx, forWrite = false)
    def colIdx(c: String): Int = {
      val i = t.cols.indexWhere(_.name == c.toLowerCase)
      if (i < 0) throw PgError("42703", s"column \"$c\" does not exist")
      i
    }
    def divCheck(ci: Int, div: Option[Long]): Unit = div.foreach { d =>
      if (d == 0L) throw PgError("22012", "division by zero")
      val oid = oidOf(t.cols(ci).pgType)
      if (oid != 23 && oid != 20)
        throw PgError("42883",
          s"operator does not exist: ${t.cols(ci).pgType} / integer")
    }
    /** (col, shift, div) of one matched group/bare item. */
    def groupExpr(gm: scala.util.matching.Regex.Match): (Int, Long, Option[Long]) =
      if (gm.group(1) != null) {
        val ci = colIdx(gm.group(1))
        val div = Option(gm.group(2)).map(_.toLong)
        divCheck(ci, div)
        (ci, 0L, div)
      } else {
        val ci = colIdx(gm.group(3))
        val div = Some(gm.group(5).toLong)
        divCheck(ci, div)
        (ci, gm.group(4).toLong, div)
      }
    val groupCols: Option[Seq[(Int, Long, Option[Long])]] = Option(m.group(4))
      .map(_.split(",").map { g =>
        groupExpr(GroupItemRe.findFirstMatchIn(g.trim)
          .getOrElse(throw PgError("42601", s"bad GROUP BY item: $g")))
      }.toSeq)
    val items: Seq[(String, Int, Int, Col)] = topLevelSplit(m.group(1)).map { raw =>
      AggItemRe.findFirstMatchIn(raw.trim) match {
        case Some(im) =>
          val fn = im.group(1).toLowerCase
          val arg = im.group(2)
          val ci =
            if (arg == "*") {
              if (fn != "count")
                throw PgError("42601", s"$fn(*) is not a function")
              -1
            } else colIdx(arg)
          val inOid = if (ci < 0) 20 else oidOf(t.cols(ci).pgType)
          if (fn == "sum" && !Set(23, 20, 701, 1700).contains(inOid))
            throw PgError("42883",
              s"function sum(${t.cols(ci).pgType}) does not exist")
          val outType = fn match {
            case "count" => "BIGINT"
            case "sum" => if (inOid == 23) "BIGINT"
              else if (inOid == 701) "DOUBLE PRECISION" else "NUMERIC"
            case _ => if (ci < 0) "BIGINT" else t.cols(ci).pgType
          }
          val name = Option(im.group(3)).map(_.toLowerCase)
            .getOrElse(if (arg == "*") fn else s"${fn}_${arg.toLowerCase}")
          (fn, ci, inOid, Col(name, outType, serial = false, unique = false, None))
        case None =>
          val bm = BareGroupRe.findFirstMatchIn(raw.trim)
            .getOrElse(throw PgError("42601", s"bad SELECT item: ${raw.trim}"))
          val (ci, shift, div) = groupExpr(bm)
          val gi = groupCols.map(_.indexOf((ci, shift, div))).getOrElse(-1)
          if (gi < 0)
            throw PgError("42803",
              s"column \"${raw.trim}\" must appear in the GROUP BY clause")
          val base = t.cols(ci)
          val alias = Option(bm.group(6)).map(_.toLowerCase)
          val out =
            if (div.isEmpty && alias.isEmpty) base
            else Col(alias.getOrElse(base.name), base.pgType,
              serial = false, unique = false, None)
          ("group", gi, oidOf(base.pgType), out)
      }
    }
    (t, items, groupCols, m)
  }

  private def aggSelect(sql: String, tx: PgTx): Result = {
    val (t, items, groupCols, m) = aggShape(sql, tx)
    t.synchronized {
      val keep = predFilter(t, parseWhere(m.group(3)))
      // accumulate per group key — the outer Option is "has a GROUP
      // BY" (None = the single global group), the inner Seq holds one
      // value per grouping column (None = SQL NULL, which groups
      // together); count as Long; int/decimal sums as exact
      // BigDecimal over the text values, float8 sums in IEEE double
      // (the arithmetic PG and Spark both use for float8 — and
      // BigDecimal cannot represent NaN/Infinity, which are legal
      // float8 cells); min/max by the column's typed comparison
      final case class Acc(count: Array[Long], sum: Array[BigDecimal],
                           dsum: Array[Double], seen: Array[Boolean],
                           mm: Array[String])
      def fresh() = Acc(Array.fill(items.length)(0L),
        Array.fill(items.length)(null), Array.fill(items.length)(0.0),
        Array.fill(items.length)(false), Array.fill(items.length)(null))
      val groups = mutable.LinkedHashMap[Option[Seq[Option[String]]], Acc]()
      if (groupCols.isEmpty) groups(None) = fresh() // global group: one
      // row out even over zero input rows, per SQL aggregate semantics
      var scanned = 0
      t.rows.foreach { r =>
        scanned += 1
        if ((scanned & 8191) == 0) checkCancel(tx) // r19 cancel point
        if (keep(r)) {
          // group key: the raw cell, or the `(col + S) / N` bucket
          // number (shift, then truncating integer division — PG
          // semantics); NULL cells group together as NULL either way.
          // The shift is checked arithmetic: a hostile offset that
          // overflows 64 bits fails loudly (22003), never wraps into a
          // wrong bucket
          val key = groupCols.map(_.map { case (gi, shift, div) =>
            Option(r(gi)).map(v =>
              div.fold(v) { d =>
                val x =
                  try Math.addExact(java.lang.Long.parseLong(v), shift)
                  catch { case _: ArithmeticException =>
                    throw PgError("22003", "bigint out of range") }
                (x / d).toString
              })
          })
          val acc = groups.getOrElseUpdate(key, fresh())
          items.zipWithIndex.foreach { case ((fn, ci, oid, _), i) =>
            fn match {
              case "group" => ()
              case "count" =>
                if (ci < 0 || r(ci) != null) acc.count(i) += 1L
              case "sum" => if (r(ci) != null) {
                if (oid == 701) {
                  acc.dsum(i) += java.lang.Double.parseDouble(r(ci))
                  acc.seen(i) = true
                } else {
                  val v = BigDecimal(r(ci))
                  acc.sum(i) = if (acc.sum(i) == null) v else acc.sum(i) + v
                }
              }
              case "min" | "max" => if (r(ci) != null) {
                val cur = acc.mm(i)
                val better = cur == null ||
                  (if (fn == "min") cmpLt(oid, r(ci), cur)
                   else cmpLt(oid, cur, r(ci)))
                if (better) acc.mm(i) = r(ci)
              }
            }
          }
        }
      }
      val out = groups.toSeq.map { case (key, acc) =>
        items.zipWithIndex.map { case ((fn, ci, oid, c), i) =>
          fn match {
            // ci of a group item IS the groupCols index (aggShape r18)
            case "group" => key.get(ci).orNull
            case "count" => acc.count(i).toString
            case "sum" =>
              if (oid == 701) {
                if (acc.seen(i)) acc.dsum(i).toString else null
              } else Option(acc.sum(i)).map { s =>
                // BIGINT sum outputs (sum over INTEGER) range-check
                // like real PG: the exact sum must fit 64 bits or the
                // statement fails with 22003 — never a silently
                // wrapped value (r18, ADVICE r17: the r16-r17 mod-2^64
                // wrap mirrored Spark's NON-ANSI overflow, but Spark 4
                // sessions default to ANSI, where the unpushed plan
                // throws — a silent pushed wrap was the one WRONG
                // answer; a loud error matches PG and ANSI alike).
                if (oidOf(c.pgType) == 20) {
                  if (!s.isValidLong)
                    throw PgError("22003", "bigint out of range")
                  s.toBigInt.longValue.toString
                } else s.bigDecimal.toPlainString
              }.orNull
            case _ => acc.mm(i)
          }
        }.toArray
      }
      Result(items.map(_._4), out, s"SELECT ${out.length}")
    }
  }

  /** COPY target resolution: `COPY schema.table (cols) FROM STDIN`.
    * Returns (table, column order). The bulk-load path — the engine's
    * batched-write posture over the wire, versus the reference's
    * row-at-a-time INSERT loop (§2 row 9). */
  def copyTarget(sql: String): (String, Seq[String]) = copyTarget(sql, null)

  def copyTarget(sql: String, tx: PgTx): (String, Seq[String]) = {
    val (name, cols, _) = copyTargetFormat(sql, tx)
    (name, cols)
  }

  /** The published COPY format suffixes — bare / explicit TEXT,
    * `BINARY` (legacy syntax) / `WITH (FORMAT BINARY)`, and
    * `CSV` / `WITH (FORMAT CSV)` — anything else is a 42601. */
  private def copyFormat(opts: String): CopyFormat =
    opts.trim.toUpperCase.replaceAll("\\s+", " ") match {
      case "" | "WITH (FORMAT TEXT)" | "(FORMAT TEXT)" => FmtText
      case "BINARY" | "WITH BINARY" | "WITH (FORMAT BINARY)" |
           "(FORMAT BINARY)" => FmtBinary
      case "CSV" | "WITH CSV" | "WITH (FORMAT CSV)" |
           "(FORMAT CSV)" => FmtCsv
      case other => throw PgError("42601", s"bad COPY options: $other")
    }

  /** Format-aware COPY FROM STDIN resolution: (table, columns,
    * format). Column default mirrors the write posture: every
    * non-serial column (serials are DB-assigned). */
  def copyTargetFormat(sql: String, tx: PgTx): (String, Seq[String], CopyFormat) = {
    val m = ("(?is)COPY\\s+([\\w]+(?:\\.[\\w]+)?)\\s*" +
      "(?:\\(([^)]*)\\))?\\s+FROM\\s+STDIN\\s*(.*)$").r.findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad COPY: ${sql.take(60)}"))
    val fmt = copyFormat(m.group(3))
    val name = m.group(1).toLowerCase
    val t = lookup(name, tx)
      .getOrElse(throw PgError("42P01", s"relation \"$name\" does not exist"))
    val cols = Option(m.group(2))
      .map(_.split(",").map(_.trim.toLowerCase).toSeq)
      .getOrElse(t.cols.filterNot(_.serial).map(_.name))
    cols.foreach { cn =>
      if (!t.cols.exists(_.name == cn))
        throw PgError("42703", s"column \"$cn\" does not exist") }
    (name, cols, fmt)
  }

  /** Format-aware COPY TO STDOUT resolution — the bulk EXPORT side.
    * Column default is ALL columns (PG's COPY TO default; serials are
    * real data on the way out). */
  def copyOutFormat(sql: String, tx: PgTx): (String, Seq[String], CopyFormat) = {
    val m = ("(?is)COPY\\s+([\\w]+(?:\\.[\\w]+)?)\\s*" +
      "(?:\\(([^)]*)\\))?\\s+TO\\s+STDOUT\\s*(.*)$").r.findFirstMatchIn(sql)
      .getOrElse(throw PgError("42601", s"bad COPY: ${sql.take(60)}"))
    val fmt = copyFormat(m.group(3))
    val name = m.group(1).toLowerCase
    val t = lookup(name, tx)
      .getOrElse(throw PgError("42P01", s"relation \"$name\" does not exist"))
    val cols = Option(m.group(2))
      .map(_.split(",").map(_.trim.toLowerCase).toSeq)
      .getOrElse(t.cols.map(_.name))
    cols.foreach { cn =>
      if (!t.cols.exists(_.name == cn))
        throw PgError("42703", s"column \"$cn\" does not exist") }
    (name, cols, fmt)
  }

  /** Export rows for COPY TO STDOUT: the copy list's projection in
    * heap (insertion) order — exactly what a SELECT without ORDER BY
    * answers, snapshotted under the table lock so a concurrent COPY IN
    * can't interleave half a batch into the export. */
  def copyOutRows(table: String, cols: Seq[String],
                  tx: PgTx): Seq[Array[String]] = {
    val t = resolve(table, tx, forWrite = false)
    t.synchronized {
      val proj = cols.map { cn =>
        val i = t.cols.indexWhere(_.name == cn)
        if (i < 0) throw PgError("42703", s"column \"$cn\" does not exist")
        i
      }
      t.rows.toSeq.map(r => proj.map(r(_)).toArray)
    }
  }

  /** DDL types of `cols` in declaration strings (`NUMERIC(12,2)`,
    * `BIGINT`, …) — what the binary COPY decode keys its per-field
    * codec on. */
  def colTypes(table: String, cols: Seq[String], tx: PgTx): Seq[String] = {
    val t = lookup(table, tx)
      .getOrElse(throw PgError("42P01", s"relation \"$table\" does not exist"))
    cols.map { cn =>
      t.cols.find(_.name == cn)
        .getOrElse(throw PgError("42703", s"column \"$cn\" does not exist"))
        .pgType
    }
  }

  /** Apply a COPY batch (text-format rows already decoded): same
    * SERIAL/UNIQUE/FK semantics as [[insert]], all-or-nothing — a
    * violated row aborts the whole batch with the table unchanged
    * (Postgres COPY is a single command). */
  def copyRows(table: String, cols: Seq[String],
               rows: Seq[Seq[String]]): Result = copyRows(table, cols, rows, null)

  def copyRows(table: String, cols: Seq[String],
               rows: Seq[Seq[String]], tx: PgTx): Result = {
    val t = resolve(table, tx, forWrite = true)
    appendRows(t, cols, rows, tx, n => s"COPY $n")
  }

  /** Shared bulk-append kernel (COPY and INSERT…SELECT): serial fill,
    * constraint pass over existing ∪ staged BEFORE any mutation, then
    * the all-or-nothing append. */
  private def appendRows(t: Table, cols: Seq[String], rows: Seq[Seq[String]],
                         tx: PgTx, tag: Int => String): Result = {
    t.synchronized {
      val colIdx = cols.map { cn =>
        val i = t.cols.indexWhere(_.name == cn)
        if (i < 0) throw PgError("42703", s"column \"$cn\" does not exist")
        i
      }
      var serial = t.nextSerial
      val staged = rows.map { vals =>
        if (vals.length != cols.length)
          throw PgError("22P04", s"row has ${vals.length} fields, expected ${cols.length}")
        val row = new Array[String](t.cols.length)
        colIdx.zip(vals).foreach { case (i, v) => row(i) = v }
        t.cols.zipWithIndex.foreach { case (c, i) =>
          if (c.serial && row(i) == null) { row(i) = serial.toString; serial += 1 }
        }
        row
      }
      // constraint pass over existing ∪ staged before any mutation
      t.cols.zipWithIndex.foreach { case (c, i) =>
        if (c.unique) {
          val existing = t.rows.map(_(i)).filter(_ != null).toSet
          val fresh = staged.map(_(i)).filter(_ != null)
          if (fresh.exists(existing) || fresh.distinct.length != fresh.length)
            throw PgError("23505",
              s"duplicate key value violates unique constraint on ${t.name}.${c.name}")
        }
        c.references.foreach { case (ft, fc) =>
          val rt = lookup(ft, tx)
            .getOrElse(throw PgError("42P01", s"relation \"$ft\" does not exist"))
          val fi = rt.cols.indexWhere(_.name == fc)
          val keys = rt.rows.map(_(fi)).toSet
          staged.foreach { r =>
            if (r(i) != null && !keys.contains(r(i)))
              throw PgError("23503",
                s"copy on ${t.name} violates foreign key: ${c.name}=${r(i)} not in $ft.$fc")
          }
        }
      }
      t.rows ++= staged
      t.nextSerial = serial
      Result(Nil, Nil, tag(staged.length))
    }
  }
}
