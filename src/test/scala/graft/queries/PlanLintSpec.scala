package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.tools.PlanLint

/** Regression gate for the per-round manual plan audit: every query in
  * [[SparkEntry.queries]] is planned at sf0.001 and its visible
  * physical plan linted for the three shapes that cannot survive
  * 100 TB (single-partition window over an unbounded frame, unbounded
  * cartesian product, unbounded broadcast-nested-loop join) — see
  * [[PlanLint]]. This is the spec VERDICT r13 asked for after the
  * `Retrieval.headTermQueries` global-vocabulary window shipped green
  * through 8 oracle gates: the oracle checks VALUES, this checks the
  * SHAPE.
  *
  * Limitation (documented, not hidden): operators whose public surface
  * eagerly materializes (`localCheckpoint(true)`) expose only an
  * ExistingRDD scan here — their inner shapes are audited by their own
  * specs and docs/PLANS.md. The lint covers everything the final frame
  * still declares.
  */
class PlanLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Reviewed allowlist — query → adjudicated single-partition shapes.
    * Keep ≤5 entries; every entry needs a WHY that names the bound. */
  private val allow: Map[String, String] = Map(
    // Dims.withSurrogateId: reference-parity DENSE surrogate ids
    // (SURVEY §2 row 20) need one global row_number; the frame is the
    // DEDUPLICATED dimension — small by construction (the reference's
    // id_mapping dict). Adjudicated acceptable since r2; the declared
    // scale paths are withDistributedId (q_distributed_id) /
    // IdStrategy.Auto in Medallion.gold / GlobalRank.withGlobalRowNumber
    // (exact dense ids, distributed — q_text_curriculum's ntile path).
    "ref_fk_resolve" -> "single-partition-window",
    "ref_surrogate_id" -> "single-partition-window",
    "ref_medallion" -> "single-partition-window",
    "ref_gold_star" -> "single-partition-window",
    // The brute ALL-PAIRS side of the banded-vs-brute parity harness —
    // quadratic BY DESIGN (it verifies hammingNearDups, the scale
    // path), same posture as q_ann_recall's exact ground truth.
    "q_dedup_simhash_pairs" -> "broadcast-nested-loop-join"
  )

  behavior of "SparkEntry.queries physical plans"

  it should "carry no unbounded single-partition window / cartesian / BNLJ" in {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val vs =
          try PlanLint.lint(fn(spark, sfDir))
          catch {
            case e: Throwable =>
              Seq(PlanLint.Violation("plan-build-failed",
                Option(e.getMessage).getOrElse(e.getClass.getName).take(200)))
          }
        val allowed = allow.get(name)
        vs.filterNot(v => allowed.contains(v.kind)).map(v => s"$name → $v")
    }
    withClue(failures.mkString("\n", "\n", "\n")) {
      failures shouldBe empty
    }
  }

  it should "lint the checkpoint-hidden inner plans too" in {
    // operators whose public surface eagerly materializes expose only
    // an ExistingRDD above; graft.Explain.innerPlans rebuilds their
    // pre-checkpoint logical frames — lint those directly
    val failures = graft.Explain.innerPlans.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        PlanLint.lint(fn(spark, sfDir)).map(v => s"$name → $v")
    }
    withClue(failures.mkString("\n", "\n", "\n")) {
      failures shouldBe empty
    }
  }
}
