package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Warehouse history maintenance (round-11): the three operators that
  * turn the reference's recreate-everything gold stage
  * (dags/dag_etl_minio_to_postgres.py:365-597 drops and reloads each
  * table per run) into an INCREMENTALLY maintained warehouse:
  *
  *  - [[scd2FromEvents]] — slowly-changing-dimension type 2: collapse
  *    a keyed, timestamp-ordered attribute stream into validity
  *    intervals (effective_from / effective_to / is_current), the
  *    canonical dimension-history shape.
  *  - [[upsertByKey]] — keyed merge: updates win over existing rows,
  *    unmatched existing rows survive (the MERGE half a plain
  *    overwrite loses).
  *  - [[snapshotDiff]] — change-data extract between two epochs of a
  *    table: inserted / deleted / changed keys.
  *
  * Scale shape: each operator is ONE hash exchange on the key (SCD2
  * adds an in-partition sort for its windows — per-key history, never
  * a global sort; upsert/diff are co-partitioned joins Spark plans as
  * one exchange per side, and a bucketed layout on the key —
  * `io.Layout.writeBucketed` — removes even those). Attributes ride
  * the shuffle once; no driver-side state.
  */
object Scd {

  /** Gaps-and-islands SCD2: given rows (key, orderCol, tracked...),
    * emit one row per RUN of consecutive equal tracked values per key,
    * with `effective_from` = first orderCol of the run,
    * `effective_to` = the next run's start (null while current) and
    * `version` = 1-based run index per key.
    *
    * `orderCol +: tieCols` must totally order each key's history —
    * with ties left unbroken the island boundaries (and therefore the
    * emitted history) would be partitioning-dependent. The island id
    * is the classic lag-compare + running sum; everything runs inside
    * ONE `Window.partitionBy(key)` family — a single hash exchange +
    * per-key sort, per-key history only, never a global sort. The
    * change test is null-SAFE (`eqNullSafe`), so a tracked attribute
    * moving to/from null opens a new version like any other change. */
  def scd2FromEvents(
      df: DataFrame,
      keyCol: Column,
      orderCol: Column,
      tracked: Seq[Column],
      tieCols: Seq[Column] = Nil): DataFrame = {
    val ordering = orderCol +: tieCols
    val byKey = Window.partitionBy(keyCol).orderBy(ordering: _*)
    val trackedStruct = struct(tracked: _*)
    val changed = when(
      lag(trackedStruct, 1).over(byKey).eqNullSafe(trackedStruct), 0L)
      .otherwise(1L) // first row of a key: lag is null → new version
    val withIsland = df
      .withColumn("__chg", changed)
      .withColumn("version", sum(col("__chg")).over(byKey))
    val island = Window.partitionBy(keyCol, col("version"))
    val byKeyVersion = Window.partitionBy(keyCol).orderBy(col("version"))
    withIsland
      .withColumn("effective_from", min(orderCol).over(island))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCol, col("version")).orderBy(ordering: _*)))
      .filter(col("__rn") === 1)
      .withColumn("effective_to",
        lead(col("effective_from"), 1).over(byKeyVersion))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__chg", "__rn")
  }

  /** Incremental SCD2 maintenance: fold a batch of keyed attribute
    * observations into an EXISTING SCD2 table (the [[scd2FromEvents]]
    * output shape) without recomputing history — the per-epoch MERGE a
    * live warehouse runs, cost ∝ batch-touched keys + their current
    * rows, never the history's depth.
    *
    * Semantics (asserted ≡ a from-scratch rebuild in `ScdSpec`): for
    * each observation newer than its key's current version whose
    * tracked values differ, the current row closes
    * (`effective_to` = the observation's time) and a new current
    * version opens; same-value observations and brand-new keys behave
    * as SCD2 dictates (no-op / version 1). Multiple observations of
    * one key in a batch fold in order. Untouched keys pass through
    * UNCHANGED — the plan is: collapse the batch with
    * [[scd2FromEvents]] (batch-sized), then one co-partitioned join
    * against ONLY the current rows of touched keys.
    *
    * `history` must be the genuine operator output (closed rows are
    * immutable facts; only `is_current` rows can change). Late
    * observations at or before a key's current `effective_from` are
    * REJECTED (`require`) rather than silently reordered — an
    * out-of-order feed needs the batch re-cut, not a quiet history
    * rewrite. `onLateDrop = true` switches to WATERMARK semantics
    * instead: late observations are dropped (they form a per-key
    * PREFIX of the batch islands, since island starts increase, so
    * the surviving suffix still alternates). That mode makes
    * re-applying an already-applied batch a no-op — the property the
    * streaming ingest's crash-replay path needs
    * ([[graft.streaming.ScdStreams]]). */
  def scd2Apply(
      history: DataFrame,
      batch: DataFrame,
      keyCol: String,
      orderCol: String,
      tracked: Seq[String],
      tieCols: Seq[String] = Nil,
      onLateDrop: Boolean = false): DataFrame = {
    // the batch history and the touched-key set are each consumed by
    // three downstream branches — cut their lineage once (both are
    // batch-bounded, never history-sized) so the window pipeline and
    // the distinct don't re-execute per branch (rehearsed: the uncut
    // form ran 2.8× at 10× data where the history rebuild runs 1.3×)
    val batchHist = scd2FromEvents(
      batch, col(keyCol), col(orderCol),
      tracked.map(col), tieCols.map(col))
      .select((keyCol +: "version" +: "effective_from" +: "effective_to" +:
        "is_current" +: tracked).map(col): _*)
      .withColumnRenamed("version", "__bv")
      .checkpointLinted()
    val touched = batchHist.select(col(keyCol)).distinct().checkpointLinted()

    val current = history.filter(col("is_current"))
      .join(touched, Seq(keyCol), "left_semi")
      .checkpointLinted() // touched-keys-sized; reread by guard + stitch
    val untouched = history.join(touched, Seq(keyCol), "left_anti")
    val closedTouched = history.filter(!col("is_current"))
      .join(touched, Seq(keyCol), "left_semi")

    // guard: the batch must be strictly after each touched key's
    // current version. Default: fail (late data needs a history
    // rewrite). onLateDrop: drop the late islands instead — they form
    // a per-key PREFIX (island starts increase with __bv), so the
    // surviving suffix still alternates and the stitch below is sound.
    val curFrom = current
      .select(col(keyCol), col("effective_from").as("__cur_from"))
    val batchLive =
      if (onLateDrop)
        batchHist.join(curFrom, Seq(keyCol), "left")
          .filter(col("__cur_from").isNull ||
            col("effective_from") > col("__cur_from"))
          .drop("__cur_from")
      else {
        val late = batchHist.join(curFrom, Seq(keyCol))
          .filter(col("effective_from") <= col("__cur_from"))
        require(late.isEmpty,
          "scd2Apply received observations at or before a current " +
            "effective_from — rebuild with scd2FromEvents instead")
        batchHist
      }

    val curTagged = current
      .select((keyCol +: "version" +: "effective_from" +: tracked).map(col): _*)
      .withColumn("__bv", lit(0L))
    val batchTagged = batchLive
      .select((keyCol +: "__bv" +: "effective_from" +: tracked).map(col): _*)
      .withColumn("version", lit(null).cast("long"))
    // Only the batch's FIRST island can repeat the current value (batch
    // islands already alternate), so a single lag-compare over __bv
    // order drops exactly the no-op islands. Then renumber from the
    // current row's version and close each row with its successor.
    val currentStruct = struct(tracked.map(col): _*)
    val byBv = Window.partitionBy(col(keyCol)).orderBy(col("__bv"))
    val stitched = curTagged.unionByName(batchTagged)
      .withColumn("__prev", lag(currentStruct, 1).over(byBv))
      .filter(col("__prev").isNull || !col("__prev").eqNullSafe(currentStruct))
    // __bv as tiebreak: island effective_from minimums can collide
    // across the boundary when tieCols did the ordering work
    val renum = Window.partitionBy(col(keyCol))
      .orderBy(col("effective_from"), col("__bv"))
    stitched
      .withColumn("__base", // existing current version, absent for new keys
        max(when(col("__bv") === 0L, col("version")))
          .over(Window.partitionBy(col(keyCol))))
      .withColumn("version",
        coalesce(col("__base"), lit(1L)) - 1L + row_number().over(renum))
      .withColumn("effective_to",
        lead(col("effective_from"), 1).over(renum))
      .withColumn("is_current", col("effective_to").isNull)
      .select((keyCol +: "version" +: "effective_from" +: "effective_to" +:
        "is_current" +: tracked).map(col): _*)
      .unionByName(untouched.select(
        (keyCol +: "version" +: "effective_from" +: "effective_to" +:
          "is_current" +: tracked).map(col): _*))
      .unionByName(closedTouched.select(
        (keyCol +: "version" +: "effective_from" +: "effective_to" +:
          "is_current" +: tracked).map(col): _*))
  }

  /** Keyed MERGE: rows of `updates` replace same-key rows of
    * `existing`; existing keys absent from updates survive; new keys
    * append. Schemas must match. One co-partitioned join (left-anti)
    * + union — at scale, bucket both sides on the key and the
    * exchange disappears entirely. */
  /** Time-travel read of an SCD2 history: the dimension AS OF `ts` —
    * each key's one version whose validity interval covers the instant
    * (`effective_from <= ts < effective_to`, the half-open convention
    * [[scd2FromEvents]] emits; a current row's null `effective_to` is
    * +∞). Keys whose first version opens after `ts` are absent — they
    * did not exist yet. A pure row filter over the history: no
    * shuffle, no window — on a materialized history table the
    * predicates push to the scan, so at 100 TB a snapshot read costs
    * one pruned pass of the history, never a rebuild. */
  def snapshotAt(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("effective_from") <= ts &&
      (col("effective_to").isNull || col("effective_to") > ts))

  def upsertByKey(existing: DataFrame, updates: DataFrame, key: Seq[String]): DataFrame = {
    require(existing.columns.sameElements(updates.columns),
      s"schema mismatch: ${existing.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    existing.join(updates.select(key.map(col): _*), key, "left_anti")
      .unionByName(updates)
  }

  /** Change-data extract between two epochs of one table: per key,
    * `change` ∈ insert / delete / update (attribute struct differs).
    * Unchanged keys are dropped — the output is the delta a downstream
    * consumer replays. One full-outer co-partitioned join on the
    * key. */
  def snapshotDiff(
      before: DataFrame, after: DataFrame, key: Seq[String]): DataFrame = {
    val attrs = before.columns.filterNot(key.contains)
    require(after.columns.filterNot(key.contains).sameElements(attrs),
      "snapshots must share one schema")
    val b = before.select(
      key.map(col) :+ struct(attrs.map(col): _*).as("__b"): _*)
    val a = after.select(
      key.map(col) :+ struct(attrs.map(col): _*).as("__a"): _*)
    b.join(a, key, "full_outer")
      .withColumn("change",
        when(col("__b").isNull, lit("insert"))
          .when(col("__a").isNull, lit("delete"))
          // null-safe: an attribute moving to/from null IS a change,
          // not a null comparison swallowed by the filter below
          .when(!col("__b").eqNullSafe(col("__a")), lit("update")))
      .filter(col("change").isNotNull)
      .select(key.map(col) :+ col("change") :+
        col("__b").as("before") :+ col("__a").as("after"): _*)
  }
}
