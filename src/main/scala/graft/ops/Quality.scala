package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data-quality profiling (the reference validated loads
  * by manual inspection + DB constraints, README.md:87-88; the engine
  * makes it an operator): one aggregate pass computes per-column null
  * counts and distinct counts, melted to (column, n_nulls, n_distinct)
  * rows.
  *
  * Shape: a SINGLE wide aggregation over the table (Spark plans one
  * expand for the distinct counts), then a metadata-sized melt — the
  * table is scanned once no matter how many columns are profiled. */
object Quality {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"))
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__distinct_$c").as("n_distinct"),
        col("__total").as("n_rows"))
    }
    wide
      .select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column"), col("p.n_nulls"), col("p.n_distinct"), col("p.n_rows"))
  }

  /** A declarative DATA EXPECTATION (the dbt-test / Great-Expectations
    * surface): a named rule over one column, evaluated to a violation
    * count. Every rule is a pure SQL predicate, so the report is
    * oracle-replayable cell for cell. */
  sealed trait Expectation { def name: String; def column: String }
  final case class NotNull(column: String) extends Expectation {
    val name = s"not_null($column)" }
  /** Violations = total − distinct non-null values: every duplicate
    * occurrence beyond the first AND every null row counts. */
  final case class Unique(column: String) extends Expectation {
    val name = s"unique($column)" }
  final case class InRange(column: String, lo: Long, hi: Long) extends Expectation {
    val name = s"in_range($column,$lo,$hi)" }
  final case class InSet(column: String, values: Seq[String]) extends Expectation {
    val name = s"in_set($column)" }
  final case class Matches(column: String, regex: String) extends Expectation {
    val name = s"matches($column)" }

  /** Evaluate an expectation SUITE in ONE table scan: every rule
    * compiles to a conditional-sum aggregate (plus one expand column
    * per Unique), so the report costs a single wide partial-agg pass
    * regardless of suite size — the [[profile]] shape. Output: one row
    * per expectation (name, column, n_rows, n_violations, pass),
    * totally ordered by name. Null semantics: range/set/regex rules
    * treat NULL as a violation (an absent value cannot satisfy a value
    * constraint; declare nullable columns with an explicit rule set
    * instead). */
  def expectations(df: DataFrame, specs: Seq[Expectation]): DataFrame = {
    require(specs.nonEmpty, "empty expectation suite")
    require(specs.map(_.name).distinct.size == specs.size,
      s"duplicate expectation names in suite")
    def violated(e: Expectation): Column = e match {
      case NotNull(c) => col(c).isNull
      case InRange(c, lo, hi) =>
        col(c).isNull || col(c) < lo || col(c) > hi
      case InSet(c, vs) => col(c).isNull || !col(c).isin(vs: _*)
      case Matches(c, re) => col(c).isNull || !col(c).rlike(re)
      case Unique(_) => lit(false) // handled as an aggregate below
    }
    val aggs = specs.zipWithIndex.map {
      case (Unique(c), i) =>
        (count(lit(1)) - countDistinct(col(c))).as(s"__v_$i")
      case (e, i) =>
        sum(when(violated(e), 1L).otherwise(0L)).as(s"__v_$i")
    } :+ count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = specs.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("expectation"), lit(e.column).as("column"),
        col("__total").as("n_rows"), col(s"__v_$i").as("n_violations"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.expectation"), col("p.column"), col("p.n_rows"),
        col("p.n_violations"),
        (col("p.n_violations") === 0L).as("pass"))
      .orderBy(col("expectation"))
  }
}
