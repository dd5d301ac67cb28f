package graft.ops

import org.apache.spark.sql.DataFrame
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
}
