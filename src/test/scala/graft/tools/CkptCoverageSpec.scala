package graft.tools

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.tools.Ckpt._

/** VERDICT r14 task 1 — the checkpoint lint choke point.
  *
  * 1. COVERAGE: `localCheckpoint(` must appear in src/main ONLY inside
  *    tools/Ckpt.scala (code lines; Scaladoc prose may mention it). Every
  *    other site routes through `checkpointLinted()` /
  *    `checkpointUnlinted(reason)`, so no pre-checkpoint plan can hide
  *    from [[PlanLint]] — grep-count == coverage-count, mechanically.
  * 2. BEHAVIOR: checkpointLinted passes clean shapes, throws on the
  *    single-partition-window killer, and the escape hatch demands a
  *    written reason.
  */
class CkptCoverageSpec extends SparkSpec {

  behavior of "checkpoint lint coverage (src/main)"

  private def scalaFiles(root: String): Seq[Path] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq

  it should "route every localCheckpoint call site through Ckpt" in {
    val offenders = for {
      p <- scalaFiles("src/main/scala")
      if !p.toString.endsWith("tools/Ckpt.scala")
      (line, i) <- Files.readAllLines(p).asScala.zipWithIndex
      t = line.trim
      // code lines only: Scaladoc/comment mentions are documentation
      if !(t.startsWith("*") || t.startsWith("//") || t.startsWith("/*"))
      if t.contains("localCheckpoint(")
    } yield s"$p:${i + 1}: $t"
    withClue(
      "raw localCheckpoint bypasses the plan lint — use checkpointLinted():\n" +
        offenders.mkString("\n")) { offenders shouldBe empty }
  }

  it should "keep the unlinted escape hatch rare and reasoned" in {
    val uses = for {
      p <- scalaFiles("src/main/scala")
      if !p.toString.endsWith("tools/Ckpt.scala")
      line <- Files.readAllLines(p).asScala
      if line.contains("checkpointUnlinted(")
    } yield line.trim
    // reviewed exceptions only; grow this bound consciously, with the
    // call-site reason string as the review record
    uses.length should be <= 2
  }

  behavior of "Ckpt.checkpointLinted"

  it should "checkpoint clean plans, preserve rows, and count the lint" in {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "k")
      .groupBy("k").agg(sum("id").as("s"))
    val before = Ckpt.lintedCount.get()
    val out = df.checkpointLinted()
    Ckpt.lintedCount.get() shouldBe before + 1
    out.collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      Map("a" -> 4L, "b" -> 2L)
  }

  it should "throw on a single-partition window over an unbounded input" in {
    // spark.range → RangeExec leaf: structurally UNBOUNDED (a local
    // Seq.toDF would scan as LocalTableScan, which the lint treats as
    // bounded driver metadata and correctly passes)
    val df = spark.range(100).toDF("id")
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    val e = intercept[IllegalStateException](df.checkpointLinted())
    e.getMessage should include("single-partition-window")
  }

  it should "reject an empty reason on the escape hatch" in {
    import spark.implicits._
    intercept[IllegalArgumentException](
      Seq(1).toDF("id").checkpointUnlinted(""))
  }
}
