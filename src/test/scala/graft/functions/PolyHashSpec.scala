package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {

  "PolyHash64" should "agree between codegen eval and the reference impl" in {
    import spark.implicits._
    PolyHash64.register(spark)
    val inputs = Seq("", "a", "hello world", "käse éÈ", "x" * 1000)
    val out = inputs.toDF("s")
      .select(expr("poly_hash64(s)").as("h"))
      .collect().map(_.getLong(0))
    out should contain theSameElementsInOrderAs inputs.map(PolyHash64.hash)
  }

  it should "be usable from SQL" in {
    PolyHash64.register(spark)
    spark.sql("SELECT poly_hash64('abc') h").collect()(0).getLong(0) shouldBe
      PolyHash64.hash("abc")
  }
}
