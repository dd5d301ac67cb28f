package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft.functions.Normalize — NFC/NFD/strip_accents expressions. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(words: Seq[String]) = {
    Normalize.register(spark)
    words.toDF("w")
      .select(col("w"),
        Normalize.nfdNormalize("w").as("d"),
        Normalize.nfcNormalize("w").as("c"),
        Normalize.stripAccentsCol("w").as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
  }

  it should "round-trip NFD -> NFC to the original bytes" in {
    Normalize.register(spark)
    val out = Seq("café", "über", "ελληνικά", "crème brûlée").toDF("w")
      .select(col("w"),
        Normalize.nfcNormalize("nfd_normalize(w)").as("rt"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (w, rt) => rt shouldBe w }
  }

  it should "strip combining marks but keep non-accent letters" in {
    val out = run(Seq("café", "señor", "zürich", "ß groß", "søster")).map(t => t._1 -> t._4).toMap
    out("café") shouldBe "cafe"
    out("señor") shouldBe "senor"
    out("zürich") shouldBe "zurich"
    out("ß groß") shouldBe "ß groß" // ß is a letter, not an accent
    out("søster") shouldBe "søster" // ø is a distinct letter, no Mn mark
  }

  it should "treat ASCII as the identity fast path and be idempotent" in {
    val ascii = "plain ascii text 123 !?"
    val out = run(Seq(ascii)).head
    out._2 shouldBe ascii
    out._3 shouldBe ascii
    out._4 shouldBe ascii
    // idempotence on the non-ASCII path
    Normalize.register(spark)
    val twice = Seq("élève").toDF("w")
      .select(Normalize.stripAccentsCol("strip_accents(w)")).head().getString(0)
    twice shouldBe "eleve"
  }

  it should "decompose precomposed characters into base + mark" in {
    val d = run(Seq("é")).head._2
    d.length shouldBe 2
    d.charAt(0) shouldBe 'e'
    Character.getType(d.charAt(1)) shouldBe Character.NON_SPACING_MARK
  }
}
