package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec,
  LocalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static scale-shape lint over physical plans — the mechanized form of
  * the per-round manual plan audit. Three anti-patterns that are green
  * and fast at sf0.1 but cannot survive a 100 TB input:
  *
  *  1. a [[WindowExec]] with an EMPTY partitionSpec over an UNBOUNDED
  *     frame — Spark moves the entire input to one task (the r13
  *     `Retrieval.headTermQueries` scale-killer: a global `row_number`
  *     over the full term/shingle vocabulary);
  *  2. a [[CartesianProductExec]] with no bounded side — O(n·m) rows;
  *  3. a [[BroadcastNestedLoopJoinExec]] with no bounded side — a
  *     broadcast of an unbounded frame.
  *
  * "Bounded" is structural, not statistical: a subtree whose row count
  * is capped by the PLAN itself regardless of input size — a limit
  * (GlobalLimit / CollectLimit / TakeOrderedAndProject, i.e. the
  * distributed head-cut idiom), a grand aggregate (empty grouping → one
  * row), or a driver-local table (LocalTableScan: collected metadata,
  * query constants). Boundedness propagates through unary nodes and
  * requires ALL children bounded through joins/unions — a join of a
  * bounded side with an unbounded side is unbounded.
  *
  * So `orderBy(...).limit(k)` → window-over-the-cut passes (the cut is
  * the bound), while `row_number().over(Window.orderBy(...))` on a raw
  * census fails — exactly the distinction the r13 audit drew. The
  * 1-row normalizer `crossJoin(broadcast(df.agg(...)))` in
  * [[graft.ops.Graph]] passes rule 3 because the broadcast side is a
  * grand aggregate.
  */
object PlanLint {

  final case class Violation(kind: String, node: String) {
    override def toString = s"$kind: $node"
  }

  /** Lint a frame's executed plan (pre-execution: AQE wrappers resolve
    * to their initial plans, which is what we want — the shape as
    * planned, before runtime stats shrink anything). */
  def lint(df: DataFrame): Seq[Violation] =
    lint(df.queryExecution.executedPlan)

  def lint(plan: SparkPlan): Seq[Violation] = {
    val out = Seq.newBuilder[Violation]
    foreachNode(plan) {
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        out += Violation("single-partition-window", summarize(w))
      case c: CartesianProductExec
          if !bounded(c.left) && !bounded(c.right) =>
        out += Violation("cartesian-product", summarize(c))
      case j: BroadcastNestedLoopJoinExec
          if !bounded(j.left) && !bounded(j.right) =>
        out += Violation("broadcast-nested-loop-join", summarize(j))
      case _ => ()
    }
    out.result()
  }

  private def summarize(p: SparkPlan): String =
    p.simpleStringWithNodeId().linesIterator.next().take(200)

  /** Walk a plan through AQE/stage/reuse wrappers, including expression
    * subqueries (a scalar subquery hides a whole plan). */
  private def foreachNode(plan: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(plan)
    (children(plan) ++ plan.subqueries).foreach(foreachNode(_)(f))
  }

  private def children(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case other =>
      // QueryStageExec / ReusedExchangeExec / InputAdapter etc. all
      // expose their wrapped plan as children
      other.children
  }

  /** Structurally bounded output cardinality (see object doc). */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec | _: LocalTableScanExec => true
    case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
    case agg: BaseAggregateExec => agg.groupingExpressions.isEmpty ||
      agg.children.forall(bounded)
    case u if u.children.nonEmpty => u.children.forall(bounded)
    case _ => false // leaf scan of real data
  }
}
