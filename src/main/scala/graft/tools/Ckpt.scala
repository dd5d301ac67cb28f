package graft.tools

import org.apache.spark.sql.Dataset

/** Lint-at-build-time checkpointing — the repo-wide choke point for the
  * `localCheckpoint(true)` cache-hygiene idiom (VERDICT r14 task 1).
  *
  * An eager local checkpoint makes a plan OPAQUE: downstream,
  * `PlanLintSpec`'s registry sweep sees only an ExistingRDD scan, so a
  * scale-killer shape hidden UPSTREAM of a checkpoint is invisible to
  * the structural lint (the r13 search-family killer shipped through 8
  * green oracle gates exactly this way). Routing every checkpoint
  * through [[CkptSyntax.checkpointLinted]] runs [[PlanLint]] on the
  * pre-checkpoint physical plan at build time — the one moment that
  * plan is still visible — and throws on a violation, so no shape can
  * hide. `CkptCoverageSpec` proves the routing: `localCheckpoint(` must
  * not appear in src/main outside this file.
  *
  * Cost: the executed plan is computed by the checkpoint anyway; the
  * lint adds a driver-side plan traversal (microseconds), nothing on
  * the executors.
  */
object Ckpt {

  /** Count of checkpoints linted this JVM — a plain monotone counter
    * so tests can assert the lint actually ran. */
  private[graft] val lintedCount = new java.util.concurrent.atomic.AtomicLong

  implicit final class CkptSyntax[T](private val ds: Dataset[T]) {

    /** `localCheckpoint(true)` with the pre-checkpoint physical plan
      * linted against the three 100 TB killers. Throws
      * IllegalStateException on a violation — a gate/spec failure, by
      * design, not a warning. */
    def checkpointLinted(): Dataset[T] = {
      val vs = PlanLint.lint(ds.queryExecution.executedPlan)
      if (vs.nonEmpty)
        throw new IllegalStateException(
          "checkpointLinted: pre-checkpoint plan has scale-killer shape(s):\n  " +
            vs.mkString("\n  "))
      lintedCount.incrementAndGet()
      ds.localCheckpoint(true)
    }

    /** Reviewed escape hatch: checkpoint WITHOUT the lint, carrying a
      * written justification (e.g. a parity harness that is brute-force
      * by design). Grep-auditable: every use names its reason at the
      * call site. */
    def checkpointUnlinted(reason: String): Dataset[T] = {
      require(reason.nonEmpty, "checkpointUnlinted requires a reason")
      ds.localCheckpoint(true)
    }
  }
}
