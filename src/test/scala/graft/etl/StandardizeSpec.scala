package graft.etl

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class StandardizeSpec extends AnyFlatSpec with Matchers {

  "snakeCase" should "match the reference's golden pairs" in {
    // expectations from the reference's silver DDL (SURVEY.md §2 #5)
    Standardize.snakeCase("Property_Title") shouldBe "property_title"
    Standardize.snakeCase("BasementYesNo") shouldBe "basement_yes_no"
    Standardize.snakeCase("SQFT_MU") shouldBe "sqft_mu"
    Standardize.snakeCase("HOA_Flag") shouldBe "hoa_flag"
    Standardize.snakeCase("IRR") shouldBe "irr"
    Standardize.snakeCase("Selling_Reason") shouldBe "selling_reason"
    Standardize.snakeCase("Neighborhood_Rating") shouldBe "neighborhood_rating"
    Standardize.snakeCase(" Padded Name ") shouldBe "padded_name"
    Standardize.snakeCase("already_snake") shouldBe "already_snake"
  }

  it should "be idempotent, lowercase, space-free on random inputs" in {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ_ 09"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = Standardize.snakeCase(s)
      Standardize.snakeCase(once) shouldBe once
      once shouldBe once.toLowerCase
      once should not include " "
    }
  }
}
