package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.tools.Ckpt._

/** Entity resolution (round-11): fuzzy matching of string entities —
  * the "are `cold widget` and `bold widget` the same product?" problem
  * every warehouse with free-text dimension keys has.
  *
  * The scale posture is the classic ER pipeline, with each stage
  * bounded:
  *   1. '''catalog''' — collapse the row stream to DISTINCT entities
  *      (name → min row id, member count). One partial-agg exchange;
  *      everything after runs on the catalog, which is vocabulary-
  *      sized, never corpus-sized.
  *   2. '''blocking''' — candidate pairs only WITHIN a block (default:
  *      the name's last word). Pair fan-out is Σ block², bounded by
  *      the blocking choice, never catalog² — the standard ER answer
  *      to the all-pairs explosion.
  *   3. '''verify''' — exact Levenshtein distance ≤ `maxDist`
  *      (codegen'd builtin, both engines implement the same DP).
  *   4. '''resolve''' — connected components over the match graph
  *      ([[Dedup.dedupDecision]]: min-entity-id canonical, the dedup
  *      survivor rule), then every entity maps to its canonical id.
  *
  * Like every similarity family here, recall is governed by the
  * blocking function: entities whose block keys differ are never
  * compared (documented, not hidden — same contract as LSH banding).
  */
object Entities {

  /** Default block key: the name's last word, case-folded. Names whose
    * lowercased form doesn't END in a letter (trailing digit or
    * punctuation) extract to the empty string; [[fuzzyPairs]] drops
    * that block rather than pairwise-comparing every such entity
    * against every other (the empty block would otherwise be one giant
    * Σblock² hotspot of unrelated names). */
  def lastWordBlock(name: Column): Column =
    regexp_extract(lower(name), "[a-z]+$", 0)

  /** Distinct-entity catalog: name, entity_id = min(row id), members. */
  def catalog(df: DataFrame, idCol: Column, nameCol: Column): DataFrame =
    df.groupBy(nameCol.as("name"))
      .agg(min(idCol).cast("long").as("entity_id"),
        count(lit(1)).as("members"))

  /** Blocked fuzzy pairs over the catalog: one row per unordered
    * entity pair in the same block within `maxDist` edits. */
  def fuzzyPairs(
      cat: DataFrame, maxDist: Int,
      blockFn: Column => Column = lastWordBlock): DataFrame = {
    val a = cat.select(col("name").as("name_a"),
      col("entity_id").as("id_a"), blockFn(col("name")).as("block"))
    val b = cat.select(col("name").as("name_b"),
      col("entity_id").as("id_b"), blockFn(col("name")).as("block"))
    a.filter(col("block") =!= "")
      .join(b.filter(col("block") =!= ""), Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("id_a"), col("id_b"),
        col("dist"))
  }

  /** Full resolution: every catalog entity mapped to the canonical
    * (min) entity id of its fuzzy-match component, plus the member
    * count it carries. Unmatched entities are their own canonical. */
  def resolve(
      df: DataFrame, idCol: Column, nameCol: Column, maxDist: Int,
      blockFn: Column => Column = lastWordBlock): DataFrame = {
    val cat = catalog(df, idCol, nameCol).checkpointLinted()
    val pairs = fuzzyPairs(cat, maxDist, blockFn)
    Dedup.dedupDecision(cat, pairs, "entity_id", "id_a", "id_b")
      .withColumnRenamed("doc_id", "entity_id")
      .withColumnRenamed("cluster_id", "canonical_id")
      .join(cat, Seq("entity_id"))
      .select(col("name"), col("entity_id"), col("canonical_id"),
        col("keep").as("is_canonical"), col("members"))
  }
}
