package graft.io

import java.sql.{Date, Timestamp}

import graft.SparkSpec
import graft.io.pg.{PgLiteClient, PgLiteServer, PgWire}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The `pglite` DataSource V2: server-derived schema (OIDs + the
  * NUMERIC typmod round trip), column pruning and `>=`/`<` filter
  * pushdown REACHING THE WIRE (asserted through the scan description
  * in the physical plan, the way parquet's ReadSchema/PushedFilters
  * are asserted), and range-partitioned parallel reads. */
class PgLiteDataSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType),
    StructField("n", DecimalType(12, 2)),
    StructField("b", BooleanType),
    StructField("ts", TimestampType),
    StructField("dt", DateType)))

  private def fixture(): (PgLiteServer, Seq[Row]) = {
    val data: Seq[Row] = (0 until 60).map { i =>
      Row(i.toLong * 2 + 1, // sparse odd keys
        if (i % 5 == 0) null else s"s $i",
        if (i % 7 == 0) null else i * 0.5,
        if (i % 6 == 0) null else new java.math.BigDecimal(s"$i.25"),
        if (i % 4 == 0) null else Boolean.box(i % 2 == 0),
        if (i % 8 == 0) null else new Timestamp(1700000000000L + i * 1000L),
        if (i % 9 == 0) null else Date.valueOf("2026-02-01"))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 3), schema)
    val (server, _) = PgLiteServer.start()
    val c = new PgLiteClient("127.0.0.1", server.port)
    c.connect()
    try {
      c.query(Sinks.createSchemaDdl("ds"))
      c.query(Sinks.createTableDdl(schema, "ds", "t"))
    } finally c.close()
    PgWire.copyDistributed(df, "127.0.0.1", server.port, "ds.t", 3)
    (server, data)
  }

  private def read(server: PgLiteServer) = spark.read.format("pglite")
    .option("host", "127.0.0.1").option("port", server.port)
    .option("table", "ds.t")

  behavior of "pglite DataSource V2"

  it should "infer the schema from RowDescription OIDs including NUMERIC typmod" in {
    val (server, _) = fixture()
    try {
      val df = read(server).load()
      df.schema shouldBe schema // names, types, and DecimalType(12,2) exact
    } finally server.stop()
  }

  it should "read every typed value back, nulls included" in {
    val (server, data) = fixture()
    try {
      val got = read(server).load().collect()
        .map(r => r.getLong(0) -> r.toSeq).toMap
      val want = data.map(r => r.getLong(0) -> r.toSeq).toMap
      got.keySet shouldBe want.keySet
      got.foreach { case (k, vs) =>
        withClue(s"row $k:") {
          vs.zip(want(k)).foreach {
            case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
              a.compareTo(b) shouldBe 0
            case (a, b) => a shouldBe b
          }
        }
      }
    } finally server.stop()
  }

  it should "push column pruning and range filters to the wire" in {
    val (server, _) = fixture()
    try {
      val q = read(server).load()
        .filter(col("k") >= 21L && col("k") < 41L)
        .select(col("k"), col("s"))
      val plan = q.queryExecution.executedPlan.toString
      // the scan description carries what actually went over the wire
      plan should include("cols=[k,s]")
      plan should include("where=[k >= 21 AND k < 41]")
      q.collect().map(_.getLong(0)).sorted shouldBe
        (21L until 41L by 2).toArray // odd keys in [21, 41)
      // an unpushable filter stays a Spark-side residual and still holds
      val r = read(server).load()
        .filter(col("s").isNotNull && col("k") >= 101L)
      r.collect().foreach { row =>
        row.getAs[String]("s") should not be null
        row.getLong(0) should be >= 101L
      }
    } finally server.stop()
  }

  it should "push =, >, <= point and boundary filters" in {
    val (server, data) = fixture()
    try {
      // point lookup: = reaches the wire
      val eq = read(server).load().filter(col("k") === 21L).select(col("k"), col("s"))
      eq.queryExecution.executedPlan.toString should include("where=[k = 21]")
      eq.collect().map(_.getLong(0)) shouldBe Array(21L)
      // strict/inclusive bounds
      val band = read(server).load()
        .filter(col("k") > 21L && col("k") <= 27L).select(col("k"))
      band.queryExecution.executedPlan.toString should
        include("where=[k > 21 AND k <= 27]")
      band.collect().map(_.getLong(0)).sorted shouldBe Array(23L, 25L, 27L)
      // = on a string column, quoted on the wire
      val seq = read(server).load().filter(col("s") === "s 3").select(col("k"))
      seq.queryExecution.executedPlan.toString should include("where=[s = 's 3']")
      seq.collect().map(_.getLong(0)) shouldBe
        data.filter(r => r.getString(1) == "s 3").map(_.getLong(0)).toArray
    } finally server.stop()
  }

  it should "plan range partitions when partitionColumn is set" in {
    val (server, data) = fixture()
    try {
      val df = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
      df.rdd.getNumPartitions shouldBe 4
      df.count() shouldBe data.length.toLong
      df.select(col("k")).collect().map(_.getLong(0)).sorted shouldBe
        data.map(_.getLong(0)).sorted // no range seam
      // pruning still reaches the wire under the partitioned scan
      val plan = df.select(col("k")).queryExecution.executedPlan.toString
      plan should include("cols=[k]")
      plan should include("rangeOn=[k x4]")
    } finally server.stop()
  }

  it should "push IN lists and IS [NOT] NULL to the wire" in {
    val (server, data) = fixture()
    try {
      // IN on the key: typed point-set lookup server-side
      val inq = read(server).load()
        .filter(col("k").isin(1L, 21L, 999L)).select(col("k"))
      inq.queryExecution.executedPlan.toString should
        include("where=[k IN (1, 21, 999)]")
      inq.collect().map(_.getLong(0)).sorted shouldBe Array(1L, 21L)
      // standalone IS NULL / IS NOT NULL render directly; composed
      // with a comparison the IsNotNull is subsumed (no WHERE text)
      val nullq = read(server).load()
        .filter(col("s").isNull).select(col("k"))
      nullq.queryExecution.executedPlan.toString should
        include("where=[s IS NULL]")
      nullq.collect().map(_.getLong(0)).sorted shouldBe
        data.filter(_.isNullAt(1)).map(_.getLong(0)).sorted.toArray
      val nnq = read(server).load()
        .filter(col("d").isNotNull).select(col("k"))
      nnq.queryExecution.executedPlan.toString should
        include("where=[d IS NOT NULL]")
      nnq.collect().length shouldBe data.count(!_.isNullAt(2))
      // IN composes with ranges on a partitioned scan like any filter
      val part = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
        .filter(col("s").isin("s 3", "s 13") && col("d").isNotNull)
        .select(col("k"))
      part.queryExecution.executedPlan.toString should
        include("where=[s IN ('s 3', 's 13') AND d IS NOT NULL]")
      part.collect().map(_.getLong(0)).sorted shouldBe
        data.filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
            Set("s 3", "s 13")(r.getString(1)))
          .map(_.getLong(0)).sorted.toArray
    } finally server.stop()
  }

  it should "push startsWith/endsWith/contains as LIKE, declining unsafe constants" in {
    val (server, data) = fixture()
    try {
      val sw = read(server).load()
        .filter(col("s").startsWith("s 1")).select(col("k"))
      sw.queryExecution.executedPlan.toString should
        include("where=[s LIKE 's 1%']")
      sw.collect().map(_.getLong(0)).sorted shouldBe
        data.filter(r => !r.isNullAt(1) && r.getString(1).startsWith("s 1"))
          .map(_.getLong(0)).sorted.toArray
      val ew = read(server).load()
        .filter(col("s").endsWith("3")).select(col("k"))
      ew.queryExecution.executedPlan.toString should
        include("where=[s LIKE '%3']")
      ew.collect().map(_.getLong(0)).sorted shouldBe
        data.filter(r => !r.isNullAt(1) && r.getString(1).endsWith("3"))
          .map(_.getLong(0)).sorted.toArray
      val cw = read(server).load()
        .filter(col("s").contains(" 2")).select(col("k"))
      cw.queryExecution.executedPlan.toString should
        include("where=[s LIKE '% 2%']")
      cw.collect().map(_.getLong(0)).sorted shouldBe
        data.filter(r => !r.isNullAt(1) && r.getString(1).contains(" 2"))
          .map(_.getLong(0)).sorted.toArray
      // a constant carrying pattern metachars ('%'/'_'/'\'/quote)
      // must NOT push — it stays a correct Spark-side residual
      val unsafe = read(server).load()
        .filter(col("s").contains("100%")).select(col("k"))
      unsafe.queryExecution.executedPlan.toString should not include "LIKE"
      unsafe.collect() shouldBe empty
    } finally server.stop()
  }

  it should "scale the partition count with the table, fail fast on NULL keys, report stats" in {
    val (server, data) = fixture()
    try {
      // 60 rows at 10 rows/task → 6 partitions (floor 4 beaten)
      val adp = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .option("rowsPerPartition", "10")
        .load()
      adp.rdd.getNumPartitions shouldBe 6
      adp.count() shouldBe data.length.toLong
      // server-probed statistics reach Spark's CBO: the scan relation
      // reports the real row count, not the sizeInBytes default
      val rel = adp.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
      rel.computeStats().rowCount shouldBe Some(BigInt(60))
      // under a pushed filter the probe counts the FILTERED cardinality
      val filtered = read(server).load().filter(col("k") <= 19L)
      val frel = filtered.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
      frel.computeStats().rowCount shouldBe
        Some(BigInt(data.count(_.getLong(0) <= 19L)))
      // the census runs UNDER the pushed WHERE: a selective filter
      // shrinks the partition count to the FILTERED row census (10
      // matching rows at 5 rows/task -> 2 partitions, where the
      // unfiltered table would plan 12) and ranges span only the
      // filtered key space
      val fadp = read(server)
        .option("partitionColumn", "k").option("numPartitions", "1")
        .option("rowsPerPartition", "5")
        .load()
        .filter(col("k") <= 19L)
      fadp.rdd.getNumPartitions shouldBe 2
      fadp.select(col("k")).collect().map(_.getLong(0)).sorted shouldBe
        (1L to 19L by 2).toArray
      // a NULL partition key would be invisible to the ranged scan:
      // planning fails fast (ADVICE r16) instead of hiding rows
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try c.query("INSERT INTO ds.t (k, s) VALUES (NULL, 'null-key')")
      finally c.close()
      val e = intercept[Exception] {
        read(server).option("partitionColumn", "k").load().count()
      }
      e.getMessage should include("NULL")
      // …but a PUSHED `k IS NULL` answers exactly those hidden rows
      // from ONE full-table partition carrying the WHERE (r18, ADVICE
      // r17: pre-r18 this reachable query died on the non-null check)
      val nulls = read(server).option("partitionColumn", "k").load()
        .filter(col("k").isNull).select(col("s"))
      nulls.rdd.getNumPartitions shouldBe 1
      nulls.queryExecution.executedPlan.toString should
        include("where=[k IS NULL]")
      nulls.collect().map(_.getString(0)) shouldBe Array("null-key")
    } finally server.stop()
  }

  it should "push user filters ALONGSIDE the key range on a partitioned scan" in {
    val (server, data) = fixture()
    try {
      // r17 (VERDICT r16 task 4): the engine WHERE takes N ANDed
      // predicates, so a partitioned scan no longer declines filters —
      // the pushed comparison ANDs onto every partition's range bounds
      val df = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
        .filter(col("k") > 21L && col("s") === "s 13").select(col("k"))
      val plan = df.queryExecution.executedPlan.toString
      plan should include("where=[k > 21 AND s = 's 13']")
      plan should include("rangeOn=[k x4]")
      df.collect().map(_.getLong(0)) shouldBe
        data.filter(r => r.getLong(0) > 21L && r.getString(1) == "s 13")
          .map(_.getLong(0)).toArray
      // MANY conjunctions push in one statement (the lifted grammar)
      val many = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
        .filter(col("k") >= 5L && col("k") < 91L && col("d") > 1.0 &&
          col("d") <= 20.0)
        .select(col("k"))
      many.queryExecution.executedPlan.toString should
        include("where=[k >= 5 AND k < 91 AND d > 1.0 AND d <= 20.0]")
      many.collect().map(_.getLong(0)).sorted shouldBe
        data.filter { r =>
          val k = r.getLong(0)
          val d = if (r.isNullAt(2)) null else r.get(2)
          k >= 5L && k < 91L && d != null &&
            d.asInstanceOf[Double] > 1.0 && d.asInstanceOf[Double] <= 20.0
        }.map(_.getLong(0)).sorted.toArray
    } finally server.stop()
  }

  it should "answer zero-column scans (count after full pruning)" in {
    val (server, data) = fixture()
    try {
      read(server).load().count() shouldBe data.length.toLong
    } finally server.stop()
  }

  behavior of "pglite DataSource V2 limit/top-n pushdown"

  it should "push ORDER BY + LIMIT to the wire on a single-connection scan" in {
    val (server, data) = fixture()
    try {
      val q = read(server).load()
        .orderBy(col("k").desc).limit(5).select(col("k"))
      val plan = q.queryExecution.executedPlan.toString
      // Spark's desc defaults to NULLS LAST; the pushed statement says so
      plan should include("pushed=[ORDER BY k DESC NULLS LAST LIMIT 5]")
      q.collect().map(_.getLong(0)) shouldBe
        data.map(_.getLong(0)).sorted.reverse.take(5)
    } finally server.stop()
  }

  it should "merge per-range local top-k under the partitioned scan" in {
    val (server, data) = fixture()
    try {
      val df = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
      val q = df.orderBy(col("k")).limit(7).select(col("k"))
      val plan = q.queryExecution.executedPlan.toString
      // each of the 4 ranges ships at most 7 rows; Spark's TakeOrdered
      // above the scan merges the local winners into the global answer
      plan should include("pushed=[ORDER BY k ASC NULLS FIRST LIMIT 7]")
      plan should include("rangeOn=[k x4]")
      q.collect().map(_.getLong(0)) shouldBe
        data.map(_.getLong(0)).sorted.take(7)
    } finally server.stop()
  }

  it should "push Spark's null ordering explicitly (ASC NULLS FIRST vs LAST)" in {
    val (server, data) = fixture()
    try {
      // Spark ASC default = NULLS FIRST (opposite of PG): the 4 rows
      // with null d must win the top-4
      val first = read(server).load()
        .orderBy(col("d").asc).limit(4).select(col("d"))
      first.queryExecution.executedPlan.toString should
        include("pushed=[ORDER BY d ASC NULLS FIRST LIMIT 4]")
      first.collect().foreach(_.isNullAt(0) shouldBe true)
      // asc_nulls_last: the smallest non-null values win instead
      val last = read(server).load()
        .orderBy(col("d").asc_nulls_last).limit(4).select(col("d"))
      last.queryExecution.executedPlan.toString should
        include("pushed=[ORDER BY d ASC NULLS LAST LIMIT 4]")
      last.collect().map(_.getDouble(0)).sorted shouldBe
        data.map(_.get(2)).collect { case d: Double => d }.sorted.take(4)
    } finally server.stop()
  }

  it should "push a bare LIMIT and keep the global limit above the scan" in {
    val (server, _) = fixture()
    try {
      val q = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load().limit(7)
      q.queryExecution.executedPlan.toString should include("pushed=[LIMIT 7]")
      q.count() shouldBe 7L // 4 ranges × ≤7 rows each, Spark takes 7
    } finally server.stop()
  }

  it should "push MULTI-COLUMN top-n and decline expression sort keys" in {
    val (server, data) = fixture()
    try {
      // composite sort pushes since r17: each item renders with its
      // own direction and explicit NULLS placement
      val q = read(server).load()
        .orderBy(col("b"), col("k").desc).limit(3).select(col("k"))
      q.queryExecution.executedPlan.toString should
        include("pushed=[ORDER BY b ASC NULLS FIRST, k DESC NULLS LAST LIMIT 3]")
      // Spark ASC default is NULLS FIRST, so null-b rows sort first
      val want = data.sortBy(r =>
        (Option(r.get(4)).fold(0)(_ => 1), // nulls first
         Option(r.get(4)).map(_.asInstanceOf[Boolean]).getOrElse(false),
         -r.getLong(0))).take(3).map(_.getLong(0))
      q.collect().map(_.getLong(0)) shouldBe want
      // the partitioned scan merges per-range composite winners too
      val part = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
        .orderBy(col("s").desc, col("k")).limit(5).select(col("k"))
      part.queryExecution.executedPlan.toString should
        include("pushed=[ORDER BY s DESC NULLS LAST, k ASC NULLS FIRST LIMIT 5]")
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 3), schema)
      part.collect().map(_.getLong(0)) shouldBe
        local.orderBy(col("s").desc, col("k")).limit(5)
          .select(col("k")).collect().map(_.getLong(0))
      // an expression-valued sort key is NOT expressible: declined,
      // Spark computes the whole top-n, values still right
      val expr = read(server).load()
        .orderBy((col("k") % 7).asc, col("k")).limit(3).select(col("k"))
      expr.queryExecution.executedPlan.toString should not include "pushed=["
      expr.collect().map(_.getLong(0)) shouldBe
        local.orderBy((col("k") % 7).asc, col("k")).limit(3)
          .select(col("k")).collect().map(_.getLong(0))
    } finally server.stop()
  }

  behavior of "pglite DataSource V2 aggregate pushdown"

  import org.apache.spark.sql.functions.{count, countDistinct, lit, max, min, sum}

  it should "push a groupless aggregate: one row per range crosses the wire" in {
    val (server, data) = fixture()
    try {
      val df = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
      val q = df.agg(count(lit(1)).as("n"), count(col("d")).as("nd"),
        sum(col("n")).as("s"), min(col("k")).as("lo"), max(col("k")).as("hi"))
      val plan = q.queryExecution.executedPlan.toString
      plan should include("agg=[count(*) AS agg0, count(d) AS agg1, " +
        "sum(n) AS agg2, min(k) AS agg3, max(k) AS agg4]")
      val r = q.collect().head
      r.getLong(0) shouldBe data.length.toLong
      r.getLong(1) shouldBe data.count(_.get(2) != null).toLong
      r.getDecimal(2).compareTo(
        data.flatMap(d => Option(d.get(3)))
          .map(_.asInstanceOf[java.math.BigDecimal])
          .reduce(_.add(_))) shouldBe 0
      r.getLong(3) shouldBe data.map(_.getLong(0)).min
      r.getLong(4) shouldBe data.map(_.getLong(0)).max
    } finally server.stop()
  }

  it should "push GROUP BY aggregates including the SQL NULL group" in {
    val (server, data) = fixture()
    try {
      val df = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
      val q = df.groupBy(col("s")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      plan should include("agg=[s, count(*) AS agg0 GROUP BY s]")
      val got = q.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      val want = data.groupBy(r => Option(r.getString(1)))
        .map { case (k, rs) => k -> rs.length.toLong }
      got shouldBe want
      got.keySet should contain(None) // fixture has null s rows
    } finally server.stop()
  }

  it should "push multi-column GROUP BY aggregates" in {
    val (server, data) = fixture()
    try {
      val df = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
      val q = df.groupBy(col("s"), col("b")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      plan should include("agg=[s, b, count(*) AS agg0 GROUP BY s, b]")
      val got = q.collect()
        .map(r => (Option(r.get(0)), Option(r.get(1))) -> r.getLong(2)).toMap
      val want = data.groupBy(r => (Option(r.get(1)), Option(r.get(4))))
        .map { case (k, rs) => k -> rs.length.toLong }
      got shouldBe want
    } finally server.stop()
  }

  it should "compose pushed aggregation with a pushed range filter" in {
    val (server, data) = fixture()
    try {
      val q = read(server).load()
        .filter(col("k") >= 21L && col("k") < 41L)
        .agg(count(lit(1)).as("n"), sum(col("k")).as("s"))
      val plan = q.queryExecution.executedPlan.toString
      plan should include("where=[k >= 21 AND k < 41]")
      plan should include("agg=[count(*) AS agg0, sum(k) AS agg1]")
      val keys = data.map(_.getLong(0)).filter(k => k >= 21L && k < 41L)
      val r = q.collect().head
      r.getLong(0) shouldBe keys.length.toLong
      // the scan ships exact decimal partials; Spark's final sum over a
      // long column is long again (it casts the partials back)
      r.getLong(1) shouldBe keys.sum
    } finally server.stop()
  }

  it should "answer count 0, not NULL, for a pushed aggregate over an empty partitioned table" in {
    val (server, _) = PgLiteServer.start()
    try {
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query("CREATE SCHEMA ds")
        c.query("CREATE TABLE ds.empty (k BIGINT, v TEXT)")
      } finally c.close()
      val df = spark.read.format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "ds.empty")
        .option("partitionColumn", "k").option("numPartitions", "4")
        .load()
      // the bounds probe finds no rows; the scan must still plan ONE
      // partition so the engine's zero-row global aggregate (count=0)
      // reaches Spark's final Sum — zero partitions would yield NULL
      val r = df.agg(count(lit(1)).as("n"), sum(col("k")).as("s")).collect().head
      r.getLong(0) shouldBe 0L
      r.isNullAt(1) shouldBe true
      df.count() shouldBe 0L // the plain scan path stays empty too
    } finally server.stop()
  }

  it should "decline aggregates it cannot express and stay correct" in {
    val (server, data) = fixture()
    try {
      val q = read(server).load().agg(countDistinct(col("s")).as("u"))
      q.queryExecution.executedPlan.toString should not include "agg=["
      q.collect().head.getLong(0) shouldBe
        data.flatMap(r => Option(r.getString(1))).distinct.length.toLong
    } finally server.stop()
  }

  it should "decline sum pushdown under non-ANSI so overflow never diverges" in {
    // VERDICT r18 wrong 1: the engine's pushed sums are exact/loud
    // (NUMERIC partials, 22003 past 64 bits) — correct under ANSI,
    // where the unpushed plan also refuses to wrap. In a NON-ANSI
    // session the unpushed plan wraps silently, so pushdown firing
    // would change observable overflow behavior; the builder must
    // decline sums there so both plans agree in BOTH modes.
    val (server, _) = PgLiteServer.start()
    try {
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query("CREATE SCHEMA ov")
        c.query("CREATE TABLE ov.t (v BIGINT)")
        c.query(s"INSERT INTO ov.t (v) VALUES (${Long.MaxValue})")
        c.query(s"INSERT INTO ov.t (v) VALUES (${Long.MaxValue})")
      } finally c.close()
      def scan() = spark.read.format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "ov.t").load()
      // the overflow outcome of one plan, comparable across plans:
      // Left(error) or Right(value)
      def outcome(df: org.apache.spark.sql.DataFrame): Either[String, Any] =
        try Right(df.collect().head.get(0))
        catch { case e: Throwable => Left(e.getClass.getSimpleName) }
      spark.conf.get("spark.sql.ansi.enabled") shouldBe "true" // Spark 4 default
      val pushedAnsi = scan().agg(sum(col("v")).as("s"))
      pushedAnsi.queryExecution.executedPlan.toString should include("agg=[sum(v)")
      // repartition between scan and aggregate blocks pushdown: the
      // same query through Spark's own Sum is the unpushed twin
      val unpushedAnsi = scan().repartition(2).agg(sum(col("v")).as("s"))
      unpushedAnsi.queryExecution.executedPlan.toString should not include "agg=["
      val (po, uo) = (outcome(pushedAnsi), outcome(unpushedAnsi))
      withClue(s"ANSI pushed=$po unpushed=$uo: ") {
        po.isLeft shouldBe true // ANSI: overflow is an error…
        uo.isLeft shouldBe true // …on both plans
      }
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try {
        val pushedOff = scan().agg(sum(col("v")).as("s"))
        // no pushed aggregate in the plan: the builder declined
        pushedOff.queryExecution.executedPlan.toString should not include "agg=["
        // and both plans wrap identically (Long.MaxValue * 2 = -2)
        outcome(pushedOff) shouldBe Right(-2L)
        outcome(scan().repartition(2).agg(sum(col("v")).as("s"))) shouldBe
          Right(-2L)
        // non-sum aggregates still push under non-ANSI (nothing to wrap)
        scan().agg(count(col("v")).as("n"))
          .queryExecution.executedPlan.toString should include("agg=[count(v)")
      } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    } finally server.stop()
  }

  it should "cap reported CBO row counts by a pushed limit" in {
    // ADVICE r17 / VERDICT r18 task 6: estimateStatistics caps numRows
    // by a pushed LIMIT — without the cap a limited scan overreports
    // its cardinality to the CBO and a broadcast-able probe side looks
    // shuffle-sized
    val (server, data) = fixture()
    def rel(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
    try {
      rel(read(server).load().limit(5)).computeStats()
        .rowCount shouldBe Some(BigInt(5))
      // a top-n pushes its limit the same way
      rel(read(server).load().orderBy(col("k")).limit(3)).computeStats()
        .rowCount shouldBe Some(BigInt(3))
      // a limit ABOVE the (filtered) census leaves the census in charge
      val fcount = data.count(_.getLong(0) <= 19L)
      rel(read(server).load().filter(col("k") <= 19L).limit(1000))
        .computeStats().rowCount shouldBe Some(BigInt(fcount))
    } finally server.stop()
  }

  it should "reject a where option outside the conjunctive grammar at parse time" in {
    // ADVICE r18: the where text is ANDed verbatim with range bounds;
    // against a real PostgreSQL an OR would bind tighter than the
    // bounds and silently duplicate its matches across every range
    // partition — so anything outside the AND-conjunction grammar is
    // refused before a single statement ships
    val (server, _) = fixture()
    try {
      val e = intercept[Exception] {
        read(server).option("where", "k = 1 OR k = 3").load().collect()
      }
      e.getMessage should include("where option")
      // a parenthesized group is equally unsafe for a grammar with no
      // precedence rules — refused too
      intercept[Exception] {
        read(server).option("where", "(k = 1 OR k = 3) AND k >= 0")
          .load().collect()
      }.getMessage should include("where option")
      // the conjunctive shapes all still pass
      read(server)
        .option("where", "k >= 3 AND s IS NOT NULL AND k IN (3, 5, 7)")
        .load().count() shouldBe 3L
    } finally server.stop()
  }

  behavior of "pglite DataSource V2 writes"

  it should "append through the V2 commit protocol and leave no stage tables" in {
    val (server, data) = fixture()
    try {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 3), schema)
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query(Sinks.createTableDdl(schema, "ds", "w"))
        df.write.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.w").mode("append").save()
        // every typed value landed, nulls included
        val got = spark.read.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.w").load().collect()
          .map(r => r.getLong(0) -> r.toSeq).toMap
        val want = data.map(r => r.getLong(0) -> r.toSeq).toMap
        got.keySet shouldBe want.keySet
        got.foreach { case (k, vs) =>
          withClue(s"row $k:") {
            vs.zip(want(k)).foreach {
              case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
                a.compareTo(b) shouldBe 0
              case (a, b) => a shouldBe b
            }
          }
        }
        // the publish transaction dropped every attempt's stage table
        // (names carry a run id since r17 — assert via the catalog)
        c.query("SELECT table_name FROM information_schema.tables " +
            "WHERE table_name >= 'w__stage_' AND table_name < 'w__stage~'")
          .rows shouldBe Nil
        // append semantics: a second write doubles the rows
        df.write.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.w").mode("append").save()
        c.query("SELECT k FROM ds.w").rows.length shouldBe 2 * data.length
      } finally c.close()
    } finally server.stop()
  }

  behavior of "pglite streaming sink"

  it should "append micro-batches through writeStream exactly once" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA st")
      engine.execute("CREATE TABLE st.t (k BIGINT, v TEXT)")
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("k", "v").writeStream
        .format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "st.t")
        // freshDir: a STALE checkpoint from a previous test run would
        // carry a committed offset ahead of the new MemoryStream's
        .option("checkpointLocation", freshDir("pglite-sink-ckpt"))
        .outputMode("append")
        .start()
      try {
        mem.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        mem.addData((3L, "c"))
        q.processAllAvailable()
      } finally q.stop()
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query("SELECT k, v FROM st.t ORDER BY k").rows.map(_.map(_.get)) shouldBe
          Seq(Seq("1", "a"), Seq("2", "b"), Seq("3", "c"))
        // one marker per committed epoch, no stage tables left
        c.query("SELECT epoch FROM st.t__epochs").rows.length should be >= 2
      } finally c.close()
    } finally server.stop()
  }

  it should "ignore a replayed epoch: the marker commits atomically with the data" in {
    val schema2 = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA st")
      engine.execute("CREATE TABLE st.r (k BIGINT, v TEXT)")
      val props = new java.util.HashMap[String, String]()
      props.put("host", "127.0.0.1")
      props.put("port", server.port.toString)
      props.put("table", "st.r")
      val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def options() = new org.apache.spark.sql.util.CaseInsensitiveStringMap(props)
        override def queryId() = "replay-test"
        override def schema() = schema2
      }
      val sw = new graft.io.pg.PgLiteDataSource().getTable(schema2,
          Array.empty, props)
        .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
        .newWriteBuilder(info).build().toStreaming
      val phys = new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
        override def numPartitions() = 1
      }
      def stageEpoch(epoch: Long, taskId: Long): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        val w = sw.createStreamingWriterFactory(phys).createWriter(0, taskId, epoch)
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](7L, org.apache.spark.unsafe.types.UTF8String.fromString("x")))
        w.write(row)
        w.commit()
      }
      // epoch 43's writers start EAGERLY while epoch 42 is still
      // committing — the r16 unscoped epoch sweep would have dropped
      // their staged rows (ADVICE r16); r17 scopes sweeps to epoch ≤ N
      val m43 = stageEpoch(43L, taskId = 9L)
      // first delivery of epoch 42 publishes; the REPLAY (checkpoint
      // recovery re-running a committed batch with a fresh task) is a
      // no-op that still cleans its stage
      sw.commit(42L, Array(stageEpoch(42L, taskId = 1L)))
      sw.commit(42L, Array(stageEpoch(42L, taskId = 2L)))
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query("SELECT k FROM st.r").rows shouldBe Seq(Seq(Some("7")))
        c.query("SELECT epoch FROM st.r__epochs").rows shouldBe
          Seq(Seq(Some("42")))
        // epoch 42's stages (original AND replay duplicate) are gone;
        // the in-flight epoch 43 stage SURVIVED the epoch-42 sweeps
        val stages = c.query(
          "SELECT table_name FROM information_schema.tables " +
            "WHERE table_name >= 'r__stage_' AND table_name < 'r__stage~'")
          .rows.flatMap(_.head)
        stages.length shouldBe 1
        stages.head should include("_e43_")
        // …and epoch 43 then commits normally
        sw.commit(43L, Array(m43))
        c.query("SELECT k FROM st.r").rows.length shouldBe 2
        c.query("SELECT epoch FROM st.r__epochs ORDER BY epoch")
          .rows.map(_.head.get) shouldBe Seq("42", "43")
      } finally c.close()
    } finally server.stop()
  }

  it should "sweep a hard-kill's orphaned stage table before the next write" in {
    val (server, data) = fixture()
    try {
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query(Sinks.createTableDdl(schema, "ds", "j"))
        // simulate a previous run's hard-killed task: its stage table
        // carries a taskId no later run's drop-first can ever guess
        c.query("CREATE TABLE ds.j__stage_p7_t999999 (k BIGINT)")
        c.query("INSERT INTO ds.j__stage_p7_t999999 (k) VALUES (1)")
        // a DECOY that merely shares the prefix but is not a stage
        // table (another target, say) must survive the sweep
        c.query("CREATE TABLE ds.j__stage_x (k BIGINT)")
        c.query("INSERT INTO ds.j__stage_x (k) VALUES (7)")
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(data, 3), schema)
        df.write.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.j").mode("append").save()
        // the write's janitor + publish sweep removed the orphan, and
        // its stale row never leaked into the target
        val e = intercept[c.PgServerError](
          c.query("SELECT k FROM ds.j__stage_p7_t999999"))
        e.code shouldBe "42P01"
        c.query("SELECT k FROM ds.j").rows.length shouldBe data.length
        // the decoy survived with its data
        c.query("SELECT k FROM ds.j__stage_x").rows.map(_.head.get) shouldBe
          Seq("7")
        // a user-cased table option still sweeps the lowercased stages
        df.write.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.J").mode("append").save()
        c.query("SELECT table_name FROM information_schema.tables " +
            "WHERE table_name >= 'j__stage_p' AND table_name < 'j__stage_p~'")
          .rows shouldBe Nil
      } finally c.close()
    } finally server.stop()
  }

  it should "leave another writer's stages alone under janitor=false" in {
    val (server, data) = fixture()
    try {
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query(Sinks.createTableDdl(schema, "ds", "jn"))
        // a CONCURRENT writer's live stage (the shape the unscoped
        // start-of-job sweep would kill — ADVICE r17: the sweep
        // assumes single-writer-at-start; janitor=false is the
        // orchestrator's opt-out for deliberately overlapping writers)
        c.query("CREATE TABLE ds.jn__stage_rabc123_p0_t7 (k BIGINT)")
        c.query("INSERT INTO ds.jn__stage_rabc123_p0_t7 (k) VALUES (42)")
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(data, 3), schema)
        df.write.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.jn").option("janitor", "false")
          .mode("append").save()
        // the append landed, and the other writer's stage SURVIVED
        c.query("SELECT k FROM ds.jn").rows.length shouldBe data.length
        c.query("SELECT k FROM ds.jn__stage_rabc123_p0_t7")
          .rows.map(_.head.get) shouldBe Seq("42")
        // default janitor=true sweeps it (regression pair)
        df.write.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.jn").mode("append").save()
        intercept[c.PgServerError](
          c.query("SELECT k FROM ds.jn__stage_rabc123_p0_t7"))
          .code shouldBe "42P01"
      } finally c.close()
    } finally server.stop()
  }

  it should "read TimestampNTZ back under a user-specified schema" in {
    import org.apache.spark.sql.types.TimestampNTZType
    val (server, _) = PgLiteServer.start()
    try {
      val ntz = StructType(Seq(
        StructField("k", LongType), StructField("t", TimestampNTZType)))
      val rows = Seq(
        Row(1L, java.time.LocalDateTime.of(2026, 2, 1, 12, 30, 5, 250000000)),
        Row(2L, null))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), ntz)
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query(Sinks.createSchemaDdl("ds"))
        c.query(Sinks.createTableDdl(ntz, "ds", "ntz"))
      } finally c.close()
      df.write.format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "ds.ntz").mode("append").save()
      // the engine types the column TIMESTAMP, so reading NTZ requires
      // the caller's schema — the decoder must invert the write text
      val got = spark.read.format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "ds.ntz").schema(ntz).load()
        .collect().map(r => r.getLong(0) -> r.get(1)).toMap
      got(1L) shouldBe java.time.LocalDateTime.of(2026, 2, 1, 12, 30, 5, 250000000)
      assert(got(2L) == null)
    } finally server.stop()
  }

  it should "fail loudly when the target table does not exist" in {
    val (server, _) = fixture()
    try {
      import spark.implicits._
      val e = intercept[Exception] {
        Seq((1L, "x")).toDF("k", "s").write.format("pglite")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("table", "ds.nope").mode("append").save()
      }
      e.getMessage should include("does not exist")
    } finally server.stop()
  }

  it should "agree with Spark on 60 seeded random filter combinations (differential)" in {
    val (server, data) = fixture()
    try {
      // the same rows as a LOCAL frame: Spark's own evaluation is the
      // reference; the wire scan + pushdown stack must agree on every
      // randomly composed filter from the pushable family (and the
      // residual family — a declined pushdown must also stay correct)
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 3), schema)
      val rnd = new scala.util.Random(20260816L) // seeded: reproducible
      import org.apache.spark.sql.Column
      def atom(): Column = rnd.nextInt(9) match {
        case 0 => col("k") >= rnd.nextLong(120)
        case 1 => col("k") < rnd.nextLong(120)
        case 2 => col("d") > rnd.nextInt(60) * 0.5
        case 3 => col("s") === s"s ${rnd.nextInt(60)}"
        case 4 => col("k").isin(
          Seq.fill(1 + rnd.nextInt(4))(rnd.nextLong(120)): _*)
        case 5 => if (rnd.nextBoolean()) col("s").isNull else col("s").isNotNull
        case 6 => col("s").startsWith(s"s ${rnd.nextInt(6)}")
        case 7 => col("s").contains(rnd.nextInt(10).toString)
        case 8 => col("n") <= new java.math.BigDecimal(s"${rnd.nextInt(60)}.25")
      }
      (1 to 60).foreach { i =>
        val pred = (1 to (1 + rnd.nextInt(3))).map(_ => atom())
          .reduce(_ && _)
        withClue(s"case $i, filter $pred:") {
          val wire = read(server)
            .option("partitionColumn", "k").option("numPartitions", "3")
            .load().filter(pred)
            .select(col("k")).collect().map(_.getLong(0)).sorted
          val want = local.filter(pred)
            .select(col("k")).collect().map(_.getLong(0)).sorted
          wire shouldBe want
        }
      }
    } finally server.stop()
  }

  it should "agree with Spark on seeded random filtered aggregations (differential)" in {
    val (server, data) = fixture()
    try {
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 3), schema)
      val rnd = new scala.util.Random(8161717L)
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.functions.{count, lit, max, min, sum}
      def atom(): Column = rnd.nextInt(5) match {
        case 0 => col("k") >= rnd.nextLong(120)
        case 1 => col("d") > rnd.nextInt(60) * 0.5
        case 2 => col("s").isNotNull
        case 3 => col("b") === (rnd.nextInt(2) == 0)
        case 4 => col("k").isin(
          Seq.fill(2 + rnd.nextInt(5))(rnd.nextLong(120)): _*)
      }
      def normalize(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
        df.collect().toSeq.map(r => (0 until r.length).map(i =>
          if (r.isNullAt(i)) "∅" else r.get(i) match {
            case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
            case v => v.toString
          })).sortBy(_.mkString("|"))
      (1 to 30).foreach { i =>
        val pred = (1 to (1 + rnd.nextInt(2))).map(_ => atom())
          .reduce(_ && _)
        withClue(s"case $i, filter $pred:") {
          def aggOf(df: org.apache.spark.sql.DataFrame) =
            df.filter(pred).groupBy(col("b"))
              .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
                min(col("d")).as("mind"), max(col("s")).as("maxs"))
          // sum(long) surfaces as Decimal(38,0) pushed vs Long local —
          // normalize compares canonical text, so types may differ
          // only in lossless widening
          normalize(aggOf(read(server)
            .option("partitionColumn", "k").option("numPartitions", "3")
            .load()).selectExpr("b", "n", "CAST(sk AS STRING) sk", "mind", "maxs")) shouldBe
          normalize(aggOf(local)
            .selectExpr("b", "n", "CAST(sk AS STRING) sk", "mind", "maxs"))
        }
      }
    } finally server.stop()
  }

  it should "agree with Spark on seeded random composite top-n queries (differential)" in {
    val (server, data) = fixture()
    try {
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 3), schema)
      val rnd = new scala.util.Random(4242424L)
      val sortable = Seq("k", "s", "d", "n", "dt")
      (1 to 30).foreach { i =>
        val names = rnd.shuffle(sortable).take(1 + rnd.nextInt(3))
        val keys = names.map { c0 =>
          if (rnd.nextBoolean()) col(c0).asc else col(c0).desc
        }
        val n = 1 + rnd.nextInt(10)
        withClue(s"case $i, orderBy(${keys.mkString(", ")}).limit($n):") {
          // rows tied on every sort key are interchangeable, so any
          // valid top-n shares the same MULTISET of sort-key tuples —
          // compare that, not row identity
          def run(df: org.apache.spark.sql.DataFrame) =
            df.orderBy(keys: _*).limit(n)
              .select(names.map(col): _*).collect()
              .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
          run(read(server)
            .option("partitionColumn", "k").option("numPartitions", "3")
            .load()) shouldBe run(local)
        }
      }
    } finally server.stop()
  }

  behavior of "pglite streaming source"

  it should "poll new rows incrementally by the key high-water mark" in {
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA src")
      engine.execute("CREATE TABLE src.t (k BIGINT, v TEXT)")
      (1 to 30).foreach(i =>
        engine.execute(s"INSERT INTO src.t (k, v) VALUES ($i, 'v$i')"))
      val dir = freshDir("pglite-stream-src")
      // a FILE sink: supports checkpoint recovery, so the restart leg
      // proves the offset resumes (memory sink cannot recover)
      def start() = spark.readStream.format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "src.t")
        .option("partitionColumn", "k")
        .option("maxKeysPerTrigger", "10")
        .load()
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      def delivered(): Array[Long] =
        spark.read.parquet(s"$dir/out").select(col("k"))
          .collect().map(_.getLong(0)).sorted
      val q = start()
      try {
        q.processAllAvailable()
        delivered() shouldBe (1L to 30L).toArray
        // the rate limit bounded each trigger to 10 keys -> >= 3 batches
        q.recentProgress.count(_.numInputRows > 0) should be >= 3
        // rows APPENDED while the query runs are picked up, once each
        (31 to 35).foreach(i =>
          engine.execute(s"INSERT INTO src.t (k, v) VALUES ($i, 'v$i')"))
        q.processAllAvailable()
        delivered() shouldBe (1L to 35L).toArray
      } finally q.stop()
      // RESTART from the checkpoint: the high-water offset resumes, so
      // only keys appended after the stop are delivered (exactly-once
      // across restarts under the append-only contract)
      (36 to 40).foreach(i =>
        engine.execute(s"INSERT INTO src.t (k, v) VALUES ($i, 'v$i')"))
      val q2 = start()
      try {
        q2.processAllAvailable()
        delivered() shouldBe (1L to 40L).toArray
      } finally q2.stop()
    } finally server.stop()
  }

  it should "drain to a snapshot under Trigger.AvailableNow and honor pushed filters" in {
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA src")
      engine.execute("CREATE TABLE src.a (k BIGINT, g TEXT)")
      (1 to 20).foreach(i => engine.execute(
        s"INSERT INTO src.a (k, g) VALUES ($i, '${if (i % 2 == 0) "even" else "odd"}')"))
      val dir = freshDir("pglite-stream-an")
      // the `where` option is the STREAMING filter path (r18): Spark
      // only runs DSv2 filter pushdown on batch relations, so the
      // server-side predicate arrives as an option and rides every
      // trigger's ranges; the Spark-side filter stays belt-and-braces
      val q = spark.readStream.format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "src.a")
        .option("partitionColumn", "k")
        .option("maxKeysPerTrigger", "7")
        .option("where", "g = 'even'")
        .load()
        .filter(col("g") === "even")
        .writeStream.format("memory").queryName("pgan")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table("pgan").select(col("k")).collect()
        .map(_.getLong(0)).sorted shouldBe (2L to 20L by 2).toArray
      // every trigger's source carried the server-side WHERE
      val descs = q.recentProgress.toSeq.flatMap(_.sources.toSeq)
        .map(_.description)
      descs should not be empty
      descs.foreach(_ should include("WHERE g = 'even'"))
    } finally server.stop()
  }

  it should "amortize AvailableNow planning probes across triggers" in {
    // r19 (VERDICT r18 task 4): the per-trigger planner used to pay
    // census + histogram (+ a min gap probe) round trips EVERY trigger;
    // under AvailableNow the key window is frozen at prepare time, so
    // one span histogram serves every trigger's boundaries. The engine
    // statement counter proves it: the whole multi-trigger drain must
    // cost setup probes (max + min + histogram + initial-offset min)
    // plus ONE data SELECT per non-empty trigger — no per-trigger
    // planning statements at all.
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA src")
      engine.execute("CREATE TABLE src.c (k BIGINT, v TEXT)")
      (1 to 30).foreach(i =>
        engine.execute(s"INSERT INTO src.c (k, v) VALUES ($i, 'v$i')"))
      val dir = freshDir("pglite-stream-probes")
      val c0 = engine.statementCount.get()
      val q = spark.readStream.format("pglite")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("table", "src.c")
        .option("partitionColumn", "k")
        .option("numPartitions", "1")
        .option("maxKeysPerTrigger", "10")
        .load()
        .writeStream.format("memory").queryName("pgprobes")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val statements = engine.statementCount.get() - c0
      spark.table("pgprobes").count() shouldBe 30L
      val triggers = q.recentProgress.count(_.numInputRows > 0)
      triggers should be >= 3
      // constant run cost (schema inference, prepare max+min+histogram,
      // initial-offset min — 6 today) + one data SELECT per non-empty
      // trigger, and NOTHING that scales with the trigger count beyond
      // the data reads themselves: the pre-r19 planner paid 3 extra
      // planning statements per trigger (gap min + census + histogram),
      // i.e. ~18 for this drain. One statement of slack.
      statements should be <= (7L + triggers)
    } finally server.stop()
  }

  it should "AND the where option with Catalyst-pushed filters on a batch scan" in {
    val (server, data) = fixture()
    try {
      val df = read(server)
        .option("partitionColumn", "k").option("numPartitions", "4")
        .option("where", "k <= 61")
        .load()
        .filter(col("d") > 1.0).select(col("k"))
      val plan = df.queryExecution.executedPlan.toString
      plan should include("where=[k <= 61 AND d > 1.0]")
      df.collect().map(_.getLong(0)).sorted shouldBe
        data.filter(r => r.getLong(0) <= 61L && !r.isNullAt(2) &&
          r.getDouble(2) > 1.0).map(_.getLong(0)).sorted.toArray
    } finally server.stop()
  }
}
