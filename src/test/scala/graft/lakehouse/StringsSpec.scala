package graft.lakehouse

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Golden-behavior tests: expected values hand-evaluated from the reference
  * Python source (difflib.SequenceMatcher, str.title, str.capitalize,
  * custom_initcap, fixUpName, fixDodgyThing). SURVEY §5.4.
  */
class StringsSpec extends AnyFunSuite {

  /** Deterministic property sampling (no scalatestplus bridge offline). */
  def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("sequenceRatio matches difflib.SequenceMatcher(None,a,b).ratio()") {
    val golden = Seq(
      ("Complted", "Completed", 0.9411764705882353),
      ("Discontd", "Discontinued", 0.8),
      ("Enroled", "Enrolled", 0.9333333333333333),
      ("abcd", "bcda", 0.75),
      ("abc", "", 0.0),
      ("", "", 1.0),
      ("a", "a", 1.0),
      ("McDonald", "Mcdonald", 0.875),
      ("Consolidated", "Demonstrated", 0.5833333333333334),
      ("None Supplied", "Completed", 0.45454545454545453),
      ("kitten", "sitting", 0.6153846153846154),
      ("similar", "dissimilar", 0.8235294117647058))
    golden.foreach { case (a, b, want) =>
      assert(math.abs(Strings.sequenceRatio(a, b) - want) < 1e-12, s"($a, $b)")
    }
  }

  test("sequenceRatio properties: [0,1], 1.0 on equal strings") {
    val pairs = samples(Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr))
    pairs.foreach { case (a, b) =>
      val r = Strings.sequenceRatio(a, b)
      assert(r >= 0.0 && r <= 1.0, s"($a, $b) -> $r")
    }
    samples(Gen.alphaNumStr).foreach { a =>
      assert(Strings.sequenceRatio(a, a) == 1.0, a)
    }
  }

  test("pythonTitle matches str.title()") {
    val golden = Seq(
      ("o'neil smith-JONES", "O'Neil Smith-Jones"),
      ("abc3de f", "Abc3De F"),
      ("HELLO world", "Hello World"),
      ("", ""),
      ("d'arcy de l'o", "D'Arcy De L'O"),
      ("x  y", "X  Y"),
      ("123abc", "123Abc"))
    golden.foreach { case (in, want) => assert(Strings.pythonTitle(in) == want, in) }
  }

  test("customInitcap matches reference custom_initcap") {
    val golden = Seq(
      ("o'neil smith-JONES", "O'Neil Smith-Jones"),
      ("McDonald's farm-house de ville", "McDonald'S Farm-House de Ville"),
      ("de la/of THE`x", "de La/of The`X"),
      ("a--b", "A--B"),
      ("JOHN (jr)", "John (jr)"),
      ("mcDONALD", "mcDONALD")) // mixed-case words preserved
    golden.foreach { case (in, want) => assert(Strings.customInitcap(in) == want, in) }
    assert(Strings.customInitcap(null) == null)
    assert(Strings.customInitcap("") == null)
  }

  test("fixUpName matches reference fixUpName") {
    val golden = Seq(
      ("SMITH, john (jr)", "John Smith"),
      ("DOE,JANE,X", "x jane Doe"),
      ("van der BERG, Jan", "Jan Van Der Berg"))
    golden.foreach { case (in, want) => assert(Strings.fixUpName(in) == want, in) }
    assert(Strings.fixUpName("  ,  ") == null)
    assert(Strings.fixUpName(null) == null)
    assert(Strings.fixUpName("") == "")
  }

  test("fixDodgyStatuses / fixDodgyThing match reference") {
    val golden = Seq(
      ("complted", "Completed"),
      ("DISCONTD", "Discontinued"),
      ("enrolled", "Enrolled"),
      (null, "None Supplied"),
      ("xyz", "Xyz"))
    golden.foreach { case (in, want) => assert(Strings.fixDodgyStatuses(in) == want, s"$in") }
    // hand-evaluated from difflib (ratios 0.96 >= 0.6: snap)
    assert(Strings.fixDodgyAssessLevel("consolidatd") == "Consolidated")
    assert(Strings.fixDodgyAssessLevel("demonstratd") == "Demonstrated")
    assert(Strings.fixDodgyAssessLevel("consolidated") == "Consolidated")
  }

  test("garbageCLO") {
    assert(Strings.garbageCLO(null))
    assert(Strings.garbageCLO(""))
    assert(Strings.garbageCLO(" N/A "))
    assert(Strings.garbageCLO("n/a"))
    assert(!Strings.garbageCLO("fine"))
  }
}
