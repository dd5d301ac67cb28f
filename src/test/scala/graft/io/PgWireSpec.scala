package graft.io

import java.sql.{Date, Timestamp}

import graft.SparkSpec
import graft.io.pg.{PgLiteClient, PgLiteServer, PgWire}
import graft.pipeline.PgGold
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** The distributed wire writer under hostile data: nulls (which the
  * oracle gate never ships — its frame is clean-filled), tab/newline/
  * backslash payloads, and the full DDL type vocabulary through
  * `copyDistributed` → wire SELECT → `PgGold.fromWire`. */
class PgWireSpec extends SparkSpec {

  behavior of "PgWire.copyDistributed"

  it should "round-trip nulls, hostile strings, and typed columns across partitions" in {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("n", DecimalType(12, 2)),
      StructField("b", BooleanType),
      StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val data: Seq[Row] = (0 until 97).map { i =>
      Row(
        i.toLong,
        i % 7 match {
          case 0 => null
          case 1 => s"tab\there $i"
          case 2 => s"line\nbreak $i"
          case 3 => s"back\\slash $i"
          case 4 => "" // empty string is NOT null
          case _ => s"plain $i"
        },
        if (i % 5 == 0) null else i * 1.25,
        if (i % 6 == 0) null else new java.math.BigDecimal(s"$i.75"),
        if (i % 4 == 0) null else Boolean.box(i % 2 == 0),
        if (i % 8 == 0) null else new Timestamp(1700000000000L + i * 1000L),
        if (i % 9 == 0) null else Date.valueOf("2026-01-15"))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 5), schema)

    val (server, _) = PgLiteServer.start()
    try {
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      c.query(Sinks.createSchemaDdl("wide"))
      c.query(Sinks.createTableDdl(schema, "wide", "t"))
      // 4 concurrent per-partition connections over 5 input partitions
      PgWire.copyDistributed(df, "127.0.0.1", server.port,
        "wide.t", numPartitions = 4)
      val back = c.query(
        s"SELECT ${schema.fieldNames.mkString(", ")} FROM wide.t")
      c.close()
      val typed = PgGold.fromWire(spark, back.rows, schema)
      // order-free equality on every typed value, nulls included
      def key(r: Row) = r.getLong(0)
      val got = typed.collect().map(r => key(r) -> r.toSeq).toMap
      val want = data.map(r => key(r) -> r.toSeq).toMap
      got.keySet shouldBe want.keySet
      // decimal equality up to scale normalization (12.75 vs 12.75)
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

  it should "need no schema when the table does not exist: COPY fails up front" in {
    val (server, _) = PgLiteServer.start()
    try {
      import spark.implicits._
      val df = Seq((1L, "x")).toDF("k", "v")
      val e = intercept[org.apache.spark.SparkException](
        PgWire.copyDistributed(df, "127.0.0.1", server.port, "nope.t", 2))
      e.getMessage should include("does not exist")
    } finally server.stop()
  }

  behavior of "engine SELECT range predicates"

  it should "filter half-open ranges with typed comparison, DESC, and NULL exclusion" in {
    val e = new graft.io.pg.PgLiteEngine
    e.execute("CREATE SCHEMA s")
    e.execute("CREATE TABLE s.t (k BIGINT, v TEXT)")
    // 9 < 10 as LONGS, not strings; one NULL key; one NULL value
    Seq("(2, 'b')", "(9, 'i')", "(10, 'j')", "(NULL, 'x')", "(30, NULL)")
      .foreach(vs => e.execute(s"INSERT INTO s.t (k, v) VALUES $vs"))
    def ks(sql: String): Seq[String] =
      e.execute(sql).rows.map(_(0)).toSeq
    // typed: k >= 9 keeps 9,10,30 (string compare would drop 9 vs '10')
    ks("SELECT k FROM s.t WHERE k >= 9 ORDER BY k") shouldBe
      Seq("9", "10", "30")
    // half-open seam: [2,10) ∪ [10,31) must cover each row exactly once
    ks("SELECT k FROM s.t WHERE k >= 2 AND k < 10 ORDER BY k") shouldBe
      Seq("2", "9")
    ks("SELECT k FROM s.t WHERE k >= 10 AND k < 31 ORDER BY k") shouldBe
      Seq("10", "30")
    // a NULL key never satisfies a range predicate
    ks("SELECT k FROM s.t WHERE k >= 0 ORDER BY k")
      .forall(_ != null) shouldBe true
    // DESC: NULLs first (PG default), then descending
    ks("SELECT k FROM s.t ORDER BY k DESC") shouldBe
      Seq(null, "30", "10", "9", "2")
    // DESC + LIMIT under a WHERE: the max probe readDistributed issues
    ks("SELECT k FROM s.t WHERE k >= 2 ORDER BY k DESC LIMIT 1") shouldBe
      Seq("30")
    // text ranges take quoted literals
    ks("SELECT k FROM s.t WHERE v >= 'b' AND v < 'j' ORDER BY k") shouldBe
      Seq("2", "9")
    // a non-numeric literal against a BIGINT column is a typed error
    intercept[graft.io.pg.PgLiteEngine.PgError](
      e.execute("SELECT k FROM s.t WHERE k >= 'oops'")).code shouldBe "22P02"
  }

  behavior of "PgWire.readDistributed"

  it should "reassemble the table seamlessly across 4 range partitions" in {
    val schema2 = StructType(Seq(
      StructField("k", LongType),
      StructField("s", StringType),
      StructField("d", DoubleType)))
    val data: Seq[Row] = (0 until 101).map { i =>
      Row(i.toLong * 3 + 7, // sparse keys: ranges land mid-gap
        if (i % 5 == 0) null else s"tab\there $i",
        if (i % 7 == 0) null else i * 0.5)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 3), schema2)
    val (server, _) = PgLiteServer.start()
    try {
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        c.query(Sinks.createSchemaDdl("rd"))
        c.query(Sinks.createTableDdl(schema2, "rd", "t"))
        PgWire.copyDistributed(df, "127.0.0.1", server.port, "rd.t", 3)
        val got = PgWire.readDistributed(spark, "127.0.0.1", server.port,
          "rd.t", schema2, "k", numPartitions = 4)
        got.rdd.getNumPartitions shouldBe 4
        val gotRows = got.collect().map(r => r.getLong(0) -> r.toSeq).toMap
        val want = data.map(r => r.getLong(0) -> r.toSeq).toMap
        gotRows shouldBe want // no seam: nothing lost, nothing doubled
      } finally c.close()
    } finally server.stop()
  }

  it should "answer an empty frame for an empty table" in {
    val schema2 = StructType(Seq(StructField("k", LongType)))
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA rd")
      engine.execute("CREATE TABLE rd.empty (k BIGINT)")
      PgWire.readDistributed(spark, "127.0.0.1", server.port,
        "rd.empty", schema2, "k").count() shouldBe 0L
    } finally server.stop()
  }

  it should "scale the partition count with the table and fail fast on NULL keys" in {
    val schema2 = StructType(Seq(StructField("k", LongType)))
    val data: Seq[Row] = (1 to 60).map(i => Row(i.toLong))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema2)
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA rd")
      engine.execute("CREATE TABLE rd.adp (k BIGINT)")
      PgWire.copyDistributed(df, "127.0.0.1", server.port, "rd.adp", 2)
      // 60 rows at 10 rows/task → 6 partitions (floor 2 beaten)
      val got = PgWire.readDistributed(spark, "127.0.0.1", server.port,
        "rd.adp", schema2, "k", numPartitions = 2, rowsPerPartition = 10L)
      got.rdd.getNumPartitions shouldBe 6
      got.collect().map(_.getLong(0)).sorted shouldBe (1L to 60L).toArray
      // small table at the default rows/task keeps the caller's floor
      PgWire.readDistributed(spark, "127.0.0.1", server.port,
        "rd.adp", schema2, "k", numPartitions = 4)
        .rdd.getNumPartitions shouldBe 4
      // a NULL key row would be INVISIBLE to the range scan: planning
      // fails fast instead of silently returning a partial table
      engine.execute("INSERT INTO rd.adp (k) VALUES (NULL)")
      val e = intercept[IllegalArgumentException](
        PgWire.readDistributed(spark, "127.0.0.1", server.port,
          "rd.adp", schema2, "k"))
      e.getMessage should include("NULL")
    } finally server.stop()
  }

  it should "derive partition counts: floor for small tables, capped at 4096" in {
    PgWire.adaptivePartitions(0L, 8, 100000L) shouldBe 8
    PgWire.adaptivePartitions(800000L, 8, 100000L) shouldBe 8
    PgWire.adaptivePartitions(800001L, 8, 100000L) shouldBe 9
    PgWire.adaptivePartitions(15000000L, 8, 100000L) shouldBe 150
    PgWire.adaptivePartitions(Long.MaxValue / 4, 8, 100000L) shouldBe 4096
  }

  it should "size write connections adaptively and reshape without collapsing upstream" in {
    // with a row count: the frame's own layout capped by the adaptive
    // target (rowsPerConnection above the floor, 4096 hard cap)
    PgWire.writeConnections(32, 8, Some(50000L), 100000L) shouldBe 8
    PgWire.writeConnections(32, 8, Some(1500000L), 100000L) shouldBe 15
    PgWire.writeConnections(5000, 8, Some(Long.MaxValue / 4), 100000L) shouldBe 4096
    // NEVER above the source count: growing would exchange the whole
    // frame just to add connections — an under-partitioned frame is
    // the caller's upstream choice
    PgWire.writeConnections(3, 8, Some(1500000L), 100000L) shouldBe 3
    // without a count: the caller's cap stands (pre-r18 behavior)
    PgWire.writeConnections(3, 8, None, 100000L) shouldBe 3
    PgWire.writeConnections(32, 8, None, 100000L) shouldBe 8
    val df32 = spark.range(0, 1000, 1, 32).toDF("k")
    // mild shrink (≤4×): coalesce — no exchange; at-or-under: no-op
    PgWire.reshapeForWrite(df32, 8).rdd.getNumPartitions shouldBe 8
    PgWire.reshapeForWrite(df32, 32).rdd.getNumPartitions shouldBe 32
    PgWire.reshapeForWrite(
      spark.range(0, 1000, 1, 4).toDF("k"), 16).rdd.getNumPartitions shouldBe 4
    // deep shrink: repartition, so the upstream stage keeps its own
    // parallelism (the r17 finding: coalesce(8) folded it into 8 tasks)
    val deep = PgWire.reshapeForWrite(spark.range(0, 1000, 1, 64).toDF("k"), 8)
    deep.rdd.getNumPartitions shouldBe 8
    deep.queryExecution.executedPlan.toString should include("Exchange")
  }

  behavior of "PgWire.equiDepthRanges"

  it should "pack skewed keyspaces into near-even row ranges from one histogram probe" in {
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA ed")
      engine.execute("CREATE TABLE ed.t (k BIGINT)")
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try {
        // id-offset sparse keyspace, the r17 streaming-source incident
        // shape: 300 dense keys at the bottom, 100 hollowed far keys —
        // an even key-space split puts 300 rows in the first range and
        // near-nothing in the rest
        val keys = (1L to 300L) ++ (9001L to 9100L)
        c.copyIn("COPY ed.t (k) FROM STDIN",
          keys.map(k => Seq(Some(k.toString))))
        val even = PgWire.splitRanges(1L, 9100L, 4)
        def count(rs: Seq[(Long, Long)]): Seq[Long] = rs.map { case (a, b) =>
          keys.count(k => k >= a && k < b).toLong
        }
        count(even).max shouldBe 300L // the skew equi-depth must kill
        val ed = PgWire.equiDepthRanges(c, "ed.t", "k", None,
          1L, 9100L, 400L, 4)
        ed.length shouldBe 4
        // half-open, gapless cover of [lo, hi]
        ed.head._1 shouldBe 1L
        ed.last._2 shouldBe 9101L
        ed.sliding(2).foreach { case Seq((_, b), (a2, _)) => b shouldBe a2 }
        // near-even depth: every range carries ~100 rows, within one
        // bucket's rows of the even target (width = span/4096 = 3)
        val depths = count(ed)
        depths.sum shouldBe 400L
        depths.max should be <= 120L
        // a WHERE composes: the histogram runs under it
        val edW = PgWire.equiDepthRanges(c, "ed.t", "k", Some("k >= 200"),
          200L, 9100L, 201L, 3)
        count(edW).sum shouldBe 201L // ranges cover every filtered row
        // fallback: a keyspace no wider than parts splits evenly
        PgWire.equiDepthRanges(c, "ed.t", "k", None, 1L, 4L, 400L, 8) shouldBe
          PgWire.splitRanges(1L, 4L, 8)
        // a negative lo no longer degrades to even splits (r19): the
        // shifted bucket expression keeps the histogram exact, so the
        // same skew bound holds with the span origin below zero
        val edNeg = PgWire.equiDepthRanges(c, "ed.t", "k", None,
          -5L, 9100L, 400L, 4)
        edNeg.head._1 shouldBe -5L
        edNeg.last._2 shouldBe 9101L
        count(edNeg).sum shouldBe 400L
        count(edNeg).max should be <= 120L
      } finally c.close()
    } finally server.stop()
  }

  it should "cover any keyspace exactly: seeded property sweep over random distributions" in {
    // the packer's one inviolable contract: whatever the distribution,
    // the ranges are a sorted, disjoint, gapless half-open cover of
    // [lo, hi] whose depths sum to every row — a seam here is a lost
    // or doubled row in every partitioned wire scan
    val rnd = new scala.util.Random(18181)
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA pp")
      (1 to 16).foreach { i =>
        engine.execute(s"CREATE TABLE pp.t$i (k BIGINT)")
        // random NEGATIVE origin every other table (r19, VERDICT r18
        // wrong 2): signed-hash / id-offset keyspaces must get the
        // same cover-and-depth contract as SERIAL ones
        val off = if (i % 2 == 0) 0L else -(1L + rnd.nextLong(2000000L))
        val shape0 = i % 4 match {
          case 0 => // uniform
            Seq.fill(50 + rnd.nextInt(300))(rnd.nextLong(1000000L))
          case 1 => // dense cluster + far outliers (the hollow shape)
            Seq.fill(200)(rnd.nextLong(500L)) ++
              Seq.fill(10)(900000000L + rnd.nextLong(100L))
          case 2 => // zipf-ish: heavy duplicates on few keys
            Seq.fill(300)(math.abs(rnd.nextGaussian() * 10).toLong)
          case _ => // two clusters
            Seq.fill(100)(rnd.nextLong(1000L)) ++
              Seq.fill(100)(700000L + rnd.nextLong(1000L))
        }
        val shape = shape0.map(_ + off)
        val c = new PgLiteClient("127.0.0.1", server.port)
        c.connect()
        try {
          c.copyIn(s"COPY pp.t$i (k) FROM STDIN",
            shape.map(k => Seq(Some(k.toString))))
          val keys = shape.sorted
          val (lo, hi) = (keys.head, keys.last)
          val parts = 1 + rnd.nextInt(10)
          val ranges = PgWire.equiDepthRanges(c, s"pp.t$i", "k", None,
            lo, hi, keys.length.toLong, parts)
          withClue(s"table $i parts=$parts n=${keys.length} [$lo,$hi]: ") {
            ranges.head._1 shouldBe lo
            ranges.last._2 shouldBe hi + 1
            ranges.sliding(2).foreach {
              case Seq((_, b), (a2, _)) => b shouldBe a2
              case _ => ()
            }
            ranges.foreach { case (a, b) => a should be < b }
            ranges.map { case (a, b) =>
              keys.count(k => k >= a && k < b)
            }.sum shouldBe keys.length
            ranges.length should be <= math.max(parts * 8, 8)
          }
        } finally c.close()
      }
    } finally server.stop()
  }

  it should "plan near-even readDistributed partitions on a hollowed keyspace" in {
    val schema2 = StructType(Seq(StructField("k", LongType)))
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA ed2")
      engine.execute("CREATE TABLE ed2.t (k BIGINT)")
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try c.copyIn("COPY ed2.t (k) FROM STDIN",
        ((1L to 90L) ++ (100000L to 100009L)).map(k => Seq(Some(k.toString))))
      finally c.close()
      val got = PgWire.readDistributed(spark, "127.0.0.1", server.port,
        "ed2.t", schema2, "k", numPartitions = 4, rowsPerPartition = 25L)
      got.count() shouldBe 100L
      // per-partition row counts: 100 rows / 4 ranges ≈ 25 each; the
      // even key-space split would put 90+10 in one range and zero in
      // the rest (the keyspace is 99.9 % hollow)
      val sizes = got.rdd.mapPartitions(it => Iterator.single(it.size))
        .collect().toSeq
      sizes.sum shouldBe 100
      sizes.max should be <= 50 // even split: 90 in one range
      sizes.count(_ > 0) should be >= 3
    } finally server.stop()
  }

  it should "keep near-even partitions on a SIGNED hollowed keyspace" in {
    // the r19 fix end-to-end: a signed-hash-style keyspace (dense
    // cluster below zero, sparse outliers far above) previously fell
    // back to even key-space splits — one partition carried ~all rows
    val schema2 = StructType(Seq(StructField("k", LongType)))
    val (server, engine) = PgLiteServer.start()
    try {
      engine.execute("CREATE SCHEMA edn")
      engine.execute("CREATE TABLE edn.t (k BIGINT)")
      val keys = (-100090L to -100001L) ++ (50000L to 50009L)
      val c = new PgLiteClient("127.0.0.1", server.port)
      c.connect()
      try c.copyIn("COPY edn.t (k) FROM STDIN",
        keys.map(k => Seq(Some(k.toString))))
      finally c.close()
      val got = PgWire.readDistributed(spark, "127.0.0.1", server.port,
        "edn.t", schema2, "k", numPartitions = 4, rowsPerPartition = 25L)
      got.collect().map(_.getLong(0)).sorted shouldBe keys.sorted.toArray
      val sizes = got.rdd.mapPartitions(it => Iterator.single(it.size))
        .collect().toSeq
      sizes.sum shouldBe 100
      sizes.max should be <= 50 // even split: 90 in one range
      sizes.count(_ > 0) should be >= 3
    } finally server.stop()
  }

  behavior of "engine shifted bucket GROUP BY"

  it should "bucket signed keys by (k + shift) / width with checked arithmetic" in {
    val e = new graft.io.pg.PgLiteEngine
    e.execute("CREATE SCHEMA sb")
    e.execute("CREATE TABLE sb.t (k BIGINT)")
    Seq(-7L, -6L, -1L, 0L, 3L, 9L).foreach(k =>
      e.execute(s"INSERT INTO sb.t (k) VALUES ($k)"))
    // shift 7 → shifted keys 0,1,6,7,10,16; width 4 → buckets 0,0,1,1,2,4
    val r = e.execute(
      "SELECT (k + 7) / 4 AS b, count(*) AS n FROM sb.t GROUP BY (k + 7) / 4")
    r.rows.map(x => (x(0), x(1))).sortBy(_._1.toLong) shouldBe
      Seq(("0", "2"), ("1", "2"), ("2", "1"), ("4", "1"))
    // unshifted truncation would fold negatives into bucket 0 with the
    // positives — the exact wrongness the shifted grammar exists to
    // avoid; the engine still answers the truncated semantics honestly
    val tr = e.execute("SELECT k / 4 AS b, count(*) AS n FROM sb.t GROUP BY k / 4")
    tr.rows.map(x => (x(0), x(1))).sortBy(_._1.toLong) shouldBe
      Seq(("-1", "2"), ("0", "3"), ("2", "1"))
    // a shift that overflows 64 bits fails loudly, never a wrong bucket
    e.execute(s"INSERT INTO sb.t (k) VALUES (${Long.MaxValue})")
    intercept[graft.io.pg.PgLiteEngine.PgError](
      e.execute("SELECT (k + 7) / 4 AS b, count(*) AS n FROM sb.t " +
        "GROUP BY (k + 7) / 4")).code shouldBe "22003"
  }
}
