package graft.io

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

/** Disk-persistent staging memo for the gate harnesses (VERDICT r13
  * task 5): a staged artifact (exact ground truth, a persisted index, a
  * pristine bucketed history) is a PURE FUNCTION of its input files, so
  * rebuilding it on every bench/verify process is wasted wall —
  * production pipelines version such artifacts per corpus snapshot and
  * reuse them. The memo keys a staged directory on a FINGERPRINT of the
  * input files (sorted name/length/mtime lines, md5) and rebuilds only
  * when the inputs drift — the same trigger TestdataDriftSpec guards
  * the schemas with.
  *
  * Crash-safe by ordering: the key stamp is written AFTER a successful
  * build (and removed before a rebuild), so a half-built tree carries
  * no stamp and rebuilds from scratch; a stale stamp can never describe
  * fresher inputs because the fingerprint is of the INPUTS, not the
  * artifact.
  */
object StageMemo {

  private val KeyFile = "_stage_key"

  /** Stage builds executed in this JVM (misses that ran a builder).
    * [[graft.Bench]] snapshots it per query and records which queries
    * paid a COLD stage build, so a fresh-checkout sweep is
    * self-describing instead of reading as a gate regression
    * (VERDICT r15 task 6). */
  val buildCount = new java.util.concurrent.atomic.AtomicLong

  /** Fingerprint of input paths (files or directories, local fs):
    * md5 over the sorted (path, length, mtime) census, SALTED with the
    * caller's builder-version string. Listing-only — never reads data
    * bytes; the testdata snapshot rewrites mtimes when it changes,
    * which is the drift signal this keys on.
    *
    * `version` names the BUILDER, not the inputs: staged artifacts
    * under target/ outlive commits, so a builder-logic or parameter
    * change (index k, history format, model layout) must invalidate
    * the stamp even when the inputs did not move — bump the call
    * site's version string with the builder. Missing input paths fail
    * fast instead of silently fingerprinting as an empty census. */
  def fingerprint(inputs: Seq[String], version: String): String = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    inputs.foreach { p =>
      require(new File(p).exists(), s"StageMemo input missing: $p")
    }
    val lines = (s"builder=$version" +: inputs.sorted
      .flatMap(p => walk(new File(p)))
      .map(f => s"${f.getAbsolutePath}|${f.length()}|${f.lastModified()}"))
    val md = MessageDigest.getInstance("MD5")
    md.update(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Recursive local-fs file copy of a staged tree into `dest`
    * (stamp file excluded) — for harnesses whose run MUTATES the
    * artifact in place (the SCD2 stream folds into its history): the
    * pristine stage is built once, each run works on a cheap copy. */
  def copyTree(src: String, dest: String): Unit = {
    val s = Paths.get(src)
    val d = Paths.get(dest)
    Files.createDirectories(d)
    val it = Files.walk(s).iterator()
    while (it.hasNext) {
      val p = it.next()
      val rel = s.relativize(p).toString
      if (rel.nonEmpty && rel != KeyFile) {
        val t = d.resolve(rel)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  /** Serve `dir` as-is when its stamp matches `key`; otherwise clear,
    * run `build` (which must populate `dir`), and stamp. Returns `dir`.
    * Synchronized per-JVM: gate queries can share one artifact. */
  def cachedDir(spark: SparkSession, dir: String, key: String)
               (build: => Unit): String = synchronized {
    val stamp = Paths.get(dir, KeyFile)
    val hit = Files.exists(stamp) &&
      new String(Files.readAllBytes(stamp), StandardCharsets.UTF_8) == key
    if (!hit) {
      buildCount.incrementAndGet()
      Fs.deleteRecursive(spark, dir)
      // recreate the (empty) root before the builder runs: Spark
      // writers mkdir themselves, plain-file builders should not have to
      Files.createDirectories(Paths.get(dir))
      build
      Files.createDirectories(Paths.get(dir))
      Files.write(stamp, key.getBytes(StandardCharsets.UTF_8))
    }
    dir
  }
}
