package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Entity-resolution contracts: catalog collapse, blocked pair recall
  * (same-block only — the documented LSH-style bound), exact distances,
  * transitive canonical assignment, unmatched entities self-canonical. */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (10L, "cold widget"), (11L, "cold widget"), (12L, "cold widget"),
    (20L, "bold widget"),   // dist 1 from cold widget
    (30L, "cool widget"),   // dist 2 from cold widget, 3 from bold
    (40L, "steel anvil"),   // different block
    (50L, "steel bolt"),    // block "bolt" ≠ "anvil": never compared
    (60L, "large gear")     // singleton block
  ).toDF("id", "name")

  behavior of "Entities"

  it should "collapse to a catalog and mine blocked pairs exactly" in {
    val cat = Entities.catalog(rows, col("id"), col("name"))
    cat.count() shouldBe 6
    cat.filter(col("name") === "cold widget")
      .select("entity_id", "members").as[(Long, Long)].head() shouldBe ((10L, 3L))

    val pairs = Entities.fuzzyPairs(cat, maxDist = 3)
      .select("name_a", "name_b", "dist")
      .as[(String, String, Int)].collect().toSet
    // widgets pair up within the block; anvil/bolt are in different
    // blocks (never compared) and gear is alone
    pairs shouldBe Set(
      ("cold widget", "bold widget", 1),
      ("cold widget", "cool widget", 2),
      ("bold widget", "cool widget", 3))
  }

  it should "resolve transitively to the min-id canonical" in {
    val out = Entities.resolve(rows, col("id"), col("name"), maxDist = 3)
      .select("name", "entity_id", "canonical_id", "is_canonical", "members")
      .as[(String, Long, Long, Boolean, Long)]
      .collect().map(r => r._1 -> r).toMap
    out("cold widget")._3 shouldBe 10L
    out("bold widget")._3 shouldBe 10L   // via the component
    out("cool widget")._3 shouldBe 10L   // transitive even at dist 2+3
    out("cold widget")._4 shouldBe true
    out("bold widget")._4 shouldBe false
    out("steel anvil")._3 shouldBe 40L   // self-canonical
    out("large gear")._4 shouldBe true
    out("cold widget")._5 shouldBe 3L    // member count carried
  }
}
