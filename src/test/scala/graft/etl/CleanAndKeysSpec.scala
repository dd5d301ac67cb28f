package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CleanAndKeysSpec extends SparkSpec {

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("n", IntegerType),
      StructField("score", DoubleType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("  MiXeD Case  ", null, null),
        Row("", 7, 1.5),
        Row(null, 3, null)),
      schema)
  }

  "trimStrings" should "strip, lower, and null-out empties" in {
    val out = Clean.trimStrings(df).collect()
    out(0).getString(0) shouldBe "mixed case"
    out(1).isNullAt(0) shouldBe true // '' → null
    out(2).isNullAt(0) shouldBe true
  }

  "fillNulls" should "fill integrals with -1, strings with 'unknown', leave floats" in {
    val out = Clean.fillNulls(Clean.trimStrings(df)).collect()
    out(0).getInt(1) shouldBe -1
    out(0).isNullAt(2) shouldBe true // double stays null (SURVEY §7.4(1))
    out(1).getString(0) shouldBe "unknown"
    out(2).getInt(1) shouldBe 3
  }

  "hashKey" should "be a 16-char sha256 prefix with 'nan' null semantics" in {
    val out = df.select(Keys.hashKey(Seq(col("name"), col("n"))).as("k")).collect()
    all(out.map(_.getString(0))) should fullyMatch regex "[0-9a-f]{16}"
    // null n → literal 'nan' in the hash input, not a null-killed concat
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("  MiXeD Case  nan".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    out(0).getString(0) shouldBe expected
  }

  "naturalKey" should "concat with the delimiter" in {
    val out = df.select(Keys.naturalKey(Seq(col("name"), col("n"))).as("k")).collect()
    out(1).getString(0) shouldBe "|7"
  }
}
