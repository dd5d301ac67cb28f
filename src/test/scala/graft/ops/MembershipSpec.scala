package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MembershipSpec extends SparkSpec {

  private val m = 1L << 16
  private val k = 5

  private def keys(n: Int, offset: Long = 0L) = {
    import spark.implicits._
    (0 until n).map(i => offset + i.toLong).toDF("key")
  }

  "Membership" should "never report a false negative on either kernel" in {
    val present = keys(2000)
    val bitsDf = Membership.bloomBits(present, "key", m, k).cache()
    val bits = Membership.collectBits(bitsDf, m)
    Membership.probeBroadcast(present, "key", bits, m, k)
      .filter(!col("bloom_hit")).count() shouldBe 0
    Membership.probeJoin(present, "key", bitsDf, m, k)
      .filter(!col("bloom_hit")).count() shouldBe 0
  }

  it should "hold the false-positive rate below 3x the analytic bound" in {
    val n = 2000
    val bits = Membership.collectBits(
      Membership.bloomBits(keys(n), "key", m, k), m)
    val fp = Membership.probeBroadcast(keys(n, 1000000L), "key", bits, m, k)
      .filter(col("bloom_hit")).count()
    val expected = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    fp.toDouble / n should be <= math.max(3 * expected, 0.01)
  }

  it should "build a bit-identical filter under any partitioning" in {
    val a = Membership.bloomBits(keys(1500).repartition(7), "key", m, k)
    val b = Membership.bloomBits(keys(1500).repartition(2), "key", m, k)
    a.join(b.withColumnRenamed("bits", "bits_b"), Seq("word"), "full")
      .filter(col("bits").isNull || col("bits_b").isNull ||
        col("bits") =!= col("bits_b"))
      .count() shouldBe 0
  }

  it should "round-trip through the persisted epoch artifact" in {
    val corpus = keys(1200)
    val bitsDf = Membership.bloomBits(corpus, "key", m, k).cache()
    val path = tmpDir("bloom-roundtrip")
    Membership.writeBloom(bitsDf, m, k, path)
    val probes = keys(2400, 600L)
    val bits = Membership.collectBits(bitsDf, m)
    val mem = Membership.probeBroadcast(probes, "key", bits, m, k)
      .select(col("key"), col("bloom_hit").as("hit_mem"))
    // broadcast-path read-back
    val bc = Membership.probeBloom(probes, "key", path)
      .select(col("key"), col("bloom_hit").as("hit_disk"))
    bc.join(mem, Seq("key"))
      .filter(col("hit_mem") =!= col("hit_disk")).count() shouldBe 0
    // forced join-path read-back (broadcastMaxBits below m)
    val jn = Membership.probeBloom(probes, "key", path, broadcastMaxBits = 64L)
      .select(col("key"), col("bloom_hit").as("hit_disk"))
    jn.join(mem, Seq("key"))
      .filter(col("hit_mem") =!= col("hit_disk")).count() shouldBe 0
  }

  it should "merge epoch filters bit-identically to a joint build" in {
    val a = keys(900)
    val b = keys(900, 450L) // overlapping epochs
    val merged = Membership.mergeBits(
      Membership.bloomBits(a, "key", m, k),
      Membership.bloomBits(b, "key", m, k))
    val joint = Membership.bloomBits(a.unionByName(b), "key", m, k)
    merged.withColumnRenamed("bits", "bits_m")
      .join(joint, Seq("word"), "full")
      .filter(col("bits").isNull || col("bits_m").isNull ||
        col("bits") =!= col("bits_m"))
      .count() shouldBe 0
  }

  it should "agree between broadcast and join probes on mixed keys" in {
    val corpus = keys(1000)
    val bitsDf = Membership.bloomBits(corpus, "key", m, k).cache()
    val bits = Membership.collectBits(bitsDf, m)
    val probes = keys(2000, 500L) // half present, half absent
    val bc = Membership.probeBroadcast(probes, "key", bits, m, k)
      .select(col("key"), col("bloom_hit").as("hit_bc"))
    val jn = Membership.probeJoin(probes, "key", bitsDf, m, k)
      .select(col("key"), col("bloom_hit").as("hit_jn"))
    bc.join(jn, Seq("key"))
      .filter(col("hit_bc") =!= col("hit_jn")).count() shouldBe 0
  }
}
