package graft.io.pg

import org.apache.spark.sql.{DataFrame, Row}

/** DISTRIBUTED wire-protocol COPY — the batched-write posture (§2 #9)
  * over the REAL PostgreSQL protocol, scaled out: one wire-v3
  * connection per input partition, each streaming its rows as
  * text-format CopyData frames through constant memory. This is the
  * shape a production Spark→Postgres writer takes (connection per
  * partition, batched frames, one COPY command per partition) — versus
  * the reference's single psycopg2 process doing one INSERT round-trip
  * per row (dags/dag_etl_minio_to_postgres.py:125-138, the ≥95 %-of-
  * runtime cost BASELINE.md measures), and versus this repo's
  * driver-side protocol-fidelity twins ([[graft.pipeline.PgGold]],
  * `ref_pg_copy`).
  *
  * Concurrency: the server is thread-per-connection and the engine
  * serializes per table with all-or-nothing COPY batches, so parallel
  * partition COPYs interleave atomically (proven under concurrent
  * clients in PgLiteSpec). Delivery is at-least-once per PARTITION
  * under task retries: a failed partition's aborted COPY left nothing
  * behind (all-or-nothing), so its retry is clean — but speculative
  * re-execution of a SUCCEEDED task would duplicate that partition;
  * run with speculation off (Spark's default) or land in a staging
  * table and swap, the same commit discipline the parquet sinks use.
  */
object PgWire {

  /** COPY `df` into `table` (schema-qualified) over `numPartitions`
    * concurrent wire connections. Column order is the frame's; values
    * ship as `Row.get(_).toString` text, nulls as `\N` — the exact
    * serialization [[graft.pipeline.PgGold.fromWire]] inverts.
    * `coalesce` (not `repartition`) caps the connection count WITHOUT
    * an exchange — the write itself is the bottleneck, not balance;
    * a caller with a skewed layout repartitions upstream. */
  def copyDistributed(df: DataFrame, host: String, port: Int,
                      table: String, numPartitions: Int = 8): Unit = {
    val cols = df.columns.toSeq
    val copySql = s"COPY $table (${cols.mkString(", ")}) FROM STDIN"
    df.coalesce(numPartitions).foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = new PgLiteClient(host, port)
        c.connect()
        try {
          val rows = it.map(r =>
            cols.indices.map(i => Option(r.get(i)).map(_.toString)))
          c.copyIn(copySql, rows, batchRows = 1024)
          ()
        } finally c.close()
      }
    }
  }
}
