package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one named entry per implemented operator (SURVEY.md §2
  * inventory + §7.5 extensions) to a `(session, sfDir) => DataFrame`;
  * `oracleSql` carries the DuckDB-runnable ANSI equivalent for every
  * SQL-expressible entry. Queries are assembled from the per-domain
  * modules under `graft.queries`.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full §7.3 medallion chain: clean → hash keys → dedup →
    * deterministic surrogate ids. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.medallion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ RelationalQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++
      AdvancedQueries.queries ++ CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracleSql ++ RelationalQueries.oracleSql ++ EventQueries.oracleSql ++
      TextQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      AdvancedQueries.oracleSql ++ CurationQueries.oracleSql
}
