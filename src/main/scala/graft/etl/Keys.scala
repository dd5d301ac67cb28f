package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Natural and hash key synthesis (SURVEY.md §2 #14, #15).
  *
  * [[naturalKey]] mirrors `generate_natural_key`
  * (dags/dag_etl_minio_to_postgres.py:203-205): string-concat the chosen
  * columns with a delimiter.
  *
  * [[hashKey]] mirrors `generate_hash_columns` (:209-212): concatenate
  * the `str()` of each column with NO delimiter, sha256, keep the first
  * 16 hex chars. The reference computes this with a row-wise Python
  * `df.apply(axis=1)`; here it is the codegen'd `sha2` expression —
  * vectorized, shuffle-free, and it scales linearly with no Python/JVM
  * boundary.
  *
  * Cast rule (SURVEY.md §7.4(2)): every input is CAST AS STRING; nulls
  * become the literal 'nan' (what Python's `str(float('nan'))` produced
  * in the reference) via coalesce, because Spark's `concat` is
  * null-killing. The same rule is encoded in the DuckDB oracle SQL so
  * engine and oracle agree by construction.
  */
object Keys {

  /** `concat_ws(delimiter, cols…)` with explicit string casts. */
  def naturalKey(cols: Seq[Column], delimiter: String = "|"): Column =
    concat_ws(delimiter, cols.map(_.cast("string")): _*)

  /** First `hashLen` hex chars of sha256 over the delimiter-less concat. */
  def hashKey(cols: Seq[Column], hashLen: Int = 16): Column =
    substring(
      sha2(concat(cols.map(c => coalesce(c.cast("string"), lit("nan"))): _*), 256),
      1, hashLen)
}
