package graft.io

import graft.SparkSpec

/** The epoch-swap commit step ([[Fs.replaceDir]]): the live tree is
  * renamed aside before the compacted tree moves in, so every reachable
  * failure leaves either the old or the new epoch intact — never
  * neither. */
class FsSpec extends SparkSpec {

  private def write(path: String, body: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, body)
    ()
  }

  private def read(path: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(path))

  "Fs.replaceDir" should "swap the compacted tree in and drop the aside" in {
    val root = tmpDir("fs-swap")
    write(s"$root/dest/data.txt", "old-epoch")
    write(s"$root/dest.compact/data.txt", "new-epoch")
    Fs.replaceDir(spark, s"$root/dest.compact", s"$root/dest")
    read(s"$root/dest/data.txt") shouldBe "new-epoch"
    new java.io.File(s"$root/dest.compact").exists() shouldBe false
    // the aside is cleaned up after a successful swap
    new java.io.File(s"$root/dest.old").exists() shouldBe false
  }

  it should "work when dest does not exist yet (first epoch)" in {
    val root = tmpDir("fs-first")
    write(s"$root/dest.compact/data.txt", "epoch-0")
    Fs.replaceDir(spark, s"$root/dest.compact", s"$root/dest")
    read(s"$root/dest/data.txt") shouldBe "epoch-0"
  }

  it should "refuse to swap when the compacted tree is missing" in {
    val root = tmpDir("fs-missing")
    write(s"$root/dest/data.txt", "live")
    an[IllegalArgumentException] should be thrownBy
      Fs.replaceDir(spark, s"$root/nope.compact", s"$root/dest")
    // the live tree is untouched
    read(s"$root/dest/data.txt") shouldBe "live"
  }

  it should "clear a leftover aside from a crashed earlier swap" in {
    val root = tmpDir("fs-stale-aside")
    write(s"$root/dest/data.txt", "live")
    write(s"$root/dest.old/data.txt", "stale-crash-leftover")
    write(s"$root/dest.compact/data.txt", "new-epoch")
    Fs.replaceDir(spark, s"$root/dest.compact", s"$root/dest")
    read(s"$root/dest/data.txt") shouldBe "new-epoch"
    new java.io.File(s"$root/dest.old").exists() shouldBe false
  }
}
