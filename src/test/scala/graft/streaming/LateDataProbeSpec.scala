package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode

/** Probe of the append-mode late-data contract on THIS Spark version:
  * a row arriving after the watermark passed its window must not
  * resurrect or re-emit that window. */
class LateDataProbeSpec extends SparkSpec {

  "append-mode tumbling agg" should "drop rows for windows the watermark finalized" in {
    val base = graft.io.Fs.deleteRecursive(spark,
      java.nio.file.Paths.get("target", "test-tmp", "late-probe").toString) match {
      case _ => java.nio.file.Paths.get("target", "test-tmp", "late-probe").toString
    }
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    def write(name: String, rows: String*): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(inDir, name),
        "event_id,ts,user_id,event_type,value\n" + rows.mkString("\n") + "\n")
    val stream = spark.readStream.schema(schema)
      .option("header", "true").csv(inDir)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 0: hour-0 and hour-9 events → watermark after = 7h
      write("b0.csv",
        "1,2024-01-01 00:05:00,1,click,1.0",
        "2,2024-01-01 09:00:00,1,click,1.0")
      q.processAllAvailable()
      // batch 1: a LATE hour-1 event (window end 02:00 << 07:00
      // watermark) plus an on-time hour-10 event
      write("b1.csv",
        "3,2024-01-01 01:30:00,1,click,1.0",
        "4,2024-01-01 10:00:00,1,click,1.0")
      q.processAllAvailable()
      // batch 2: sentinel far ahead so every live window flushes
      write("b2.csv", "5,2024-01-02 00:00:00,1,click,1.0")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).sorted
    info(s"emitted: ${out.mkString(", ")}")
    // hour-1 window must be absent (its only row arrived late)
    out.map(_._1).exists(_.startsWith("2024-01-01 01:")) shouldBe false
  }

  /** Pinned OBSERVED behavior on this Spark version: when every file is
    * staged before the query starts and AvailableNow plans the batches,
    * the late row is NOT dropped (the hour-1 window below is emitted)
    * even though the offset log records the advanced watermark for the
    * second batch. This is why [[graft.queries.EventQueries
    * .lateDataParity]] feeds the late file in a second
    * `processAllAvailable` pass — the sequential pattern above, whose
    * drop semantics match the documented watermark contract. If a Spark
    * upgrade flips this assertion, the gate can switch back to
    * AvailableNow. */
  it should "NOT drop late rows under AvailableNow with files staged up front (pinned quirk)" in {
    val base = java.nio.file.Paths.get("target", "test-tmp", "late-probe-an").toString
    graft.io.Fs.deleteRecursive(spark, base)
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    def write(name: String, mtime: Long, rows: String*): Unit = {
      val p = java.nio.file.Paths.get(inDir, name)
      java.nio.file.Files.writeString(p,
        "event_id,ts,user_id,event_type,value\n" + rows.mkString("\n") + "\n")
      p.toFile.setLastModified(mtime); ()
    }
    val now = System.currentTimeMillis()
    write("0-ontime.csv", now - 120000,
      "1,2024-01-01 00:05:00,1,click,1.0",
      "2,2024-01-01 09:00:00,1,click,1.0")
    write("1-late.csv", now - 60000,
      "3,2024-01-01 01:30:00,1,click,1.0")
    write("2-sentinel.csv", now,
      "5,2024-01-02 00:00:00,1,click,1.0")
    val stream = spark.readStream.schema(schema)
      .option("header", "true").option("maxFilesPerTrigger", 1).csv(inDir)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).sorted
    info(s"emitted: ${out.mkString(", ")}")
    out.map(_._1).exists(_.startsWith("2024-01-01 01:")) shouldBe true
  }
}
