package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** graft.io.StageMemo — the disk-persistent staging memo under the
  * gate harnesses: key semantics (hit / input-drift rebuild /
  * half-built rebuild) and the copy-restore path. */
class StageMemoSpec extends SparkSpec {

  behavior of "StageMemo.cachedDir"

  it should "build once, then serve hits without re-running the builder" in {
    val in = freshDir("memo-in")
    Files.writeString(Paths.get(in, "a.txt"), "alpha")
    val dir = freshDir("memo-out")
    var builds = 0
    def build(): Unit = {
      builds += 1
      Files.writeString(Paths.get(dir, "artifact"), s"v$builds")
    }
    val key = StageMemo.fingerprint(Seq(in), "spec-v1")
    StageMemo.cachedDir(spark, dir, key)(build())
    StageMemo.cachedDir(spark, dir, key)(build())
    builds shouldBe 1
    Files.readString(Paths.get(dir, "artifact")) shouldBe "v1"
  }

  it should "rebuild when the input fingerprint drifts, clearing the old tree" in {
    val in = freshDir("memo-drift-in")
    val f = Paths.get(in, "a.txt")
    Files.writeString(f, "alpha")
    val dir = freshDir("memo-drift-out")
    var builds = 0
    def build(): Unit = {
      builds += 1
      Files.writeString(Paths.get(dir, s"artifact$builds"), "x")
    }
    StageMemo.cachedDir(spark, dir, StageMemo.fingerprint(Seq(in), "spec-v1"))(build())
    // content + mtime change → new fingerprint → rebuild; the stale
    // artifact must be GONE (cachedDir clears before building)
    Files.writeString(f, "alpha-changed")
    f.toFile.setLastModified(f.toFile.lastModified() + 5000)
    StageMemo.cachedDir(spark, dir, StageMemo.fingerprint(Seq(in), "spec-v1"))(build())
    builds shouldBe 2
    Files.exists(Paths.get(dir, "artifact1")) shouldBe false
    Files.exists(Paths.get(dir, "artifact2")) shouldBe true
  }

  it should "treat a half-built tree (no stamp) as a miss" in {
    val in = freshDir("memo-crash-in")
    Files.writeString(Paths.get(in, "a.txt"), "alpha")
    val dir = freshDir("memo-crash-out")
    // simulate a crash: artifact present, stamp never written
    Files.writeString(Paths.get(dir, "artifact"), "halfway")
    var builds = 0
    StageMemo.cachedDir(spark, dir, StageMemo.fingerprint(Seq(in), "spec-v1")) {
      builds += 1
      Files.writeString(Paths.get(dir, "artifact"), "complete")
    }
    builds shouldBe 1
    Files.readString(Paths.get(dir, "artifact")) shouldBe "complete"
  }

  it should "rebuild when the builder version bumps, even with unchanged inputs" in {
    val in = freshDir("memo-ver-in")
    Files.writeString(Paths.get(in, "a.txt"), "alpha")
    val dir = freshDir("memo-ver-out")
    var builds = 0
    def build(): Unit = { builds += 1 }
    // stale-artifact hazard (r14 ADVICE): target/ outlives commits, so
    // builder-logic changes must invalidate the stamp via the salt
    StageMemo.cachedDir(spark, dir, StageMemo.fingerprint(Seq(in), "v1"))(build())
    StageMemo.cachedDir(spark, dir, StageMemo.fingerprint(Seq(in), "v1"))(build())
    builds shouldBe 1
    StageMemo.cachedDir(spark, dir, StageMemo.fingerprint(Seq(in), "v2"))(build())
    builds shouldBe 2
  }

  it should "fail fast on a missing input path instead of fingerprinting empty" in {
    intercept[IllegalArgumentException](
      StageMemo.fingerprint(Seq("/nonexistent/nope.parquet"), "v1"))
  }

  behavior of "StageMemo.copyTree"

  it should "copy nested trees excluding the stamp, for mutate-in-place runs" in {
    val src = freshDir("memo-copy-src")
    Files.createDirectories(Paths.get(src, "bucket=3"))
    Files.writeString(Paths.get(src, "bucket=3", "part-0.parquet"), "data")
    Files.writeString(Paths.get(src, "_stage_key"), "k")
    val dst = freshDir("memo-copy-dst") + "/hist"
    StageMemo.copyTree(src, dst)
    Files.readString(Paths.get(dst, "bucket=3", "part-0.parquet")) shouldBe "data"
    Files.exists(Paths.get(dst, "_stage_key")) shouldBe false
    // mutating the copy leaves the pristine stage untouched
    Files.writeString(Paths.get(dst, "bucket=3", "part-0.parquet"), "mutated")
    Files.readString(Paths.get(src, "bucket=3", "part-0.parquet")) shouldBe "data"
  }
}
