package graft

import graft.functions.{Abbreviations, AsciiFold, FuzzyMatch, LegalForms}
import graft.preprocess.Preprocessor
import org.scalatest.funsuite.AnyFunSuite

class TextKernelsSpec extends AnyFunSuite {

  test("abbreviationsToWords merges dotted/spaced initialisms") {
    assert(Abbreviations.abbreviationsToWords("ING BANK B.V.") == "ING BANK BV")
    assert(Abbreviations.abbreviationsToWords("Z. S. Corp") == "ZS Corp")
    assert(Abbreviations.abbreviationsToWords("A.B.C. Holding") == "ABC Holding")
    assert(Abbreviations.abbreviationsToWords("A B C Holding") == "ABC Holding")
    assert(Abbreviations.abbreviationsToWords("plain name") == "plain name")
  }

  test("legalAbbreviationsToWords merges only known legal forms") {
    assert(Abbreviations.legalAbbreviationsToWords("bank b.v.").contains("bv"))
    // 'xy' is not a legal form => untouched
    assert(Abbreviations.legalAbbreviationsToWords("bank x.y.") == "bank x.y.")
  }

  test("abbrMatch finds open forms") {
    // needs >=3 lowercase chars in the name for the ALL-CAPS finder to engage
    assert(Abbreviations.abbrMatch("SK Industries", "Fenerbahce Spor Klubu"))
    assert(Abbreviations.abbrMatch("PetroBras", "Petroleo Brasileiro B.V."))
    assert(!Abbreviations.abbrMatch("XYZ", "completely different"))
  }

  test("asciiFold strips accents and transliterates") {
    assert(AsciiFold.fold("Café Müller") == "Cafe Muller")
    assert(AsciiFold.fold("Ångström ØRSTED") == "Angstrom ORSTED")
    assert(AsciiFold.fold("straße") == "strasse")
    assert(AsciiFold.fold("Москва") == "Moskva")
  }

  test("legal form extraction and removal") {
    assert(LegalForms.extract("Acme Holding B.V.").nonEmpty)
    assert(LegalForms.removeLegalForm("Acme Widgets GmbH") == "Acme Widgets")
    assert(LegalForms.removeLegalForm("Acme Widgets") == "Acme Widgets")
    assert(LegalForms.matchClass("Acme GmbH", "Acme G.m.b.H") == "identical" ||
           LegalForms.matchClass("Acme GmbH", "Acme GmbH") == "identical")
  }

  test("fuzzy ratios behave") {
    assert(FuzzyMatch.jaro("martha", "marhta") > 0.94)
    assert(FuzzyMatch.ratio("abcd", "abcd") == 1.0)
    assert(FuzzyMatch.tokenSortRatio("b a", "a b") == 1.0)
    assert(FuzzyMatch.tokenSetRatio("a b c", "c b a extra") > 0.9)
    assert(FuzzyMatch.partialRatio("abc", "xxabcxx") == 1.0)
    assert(FuzzyMatch.levenshtein("kitten", "sitting") == 3)
  }
}

class PreprocessorSpec extends SparkSpec {
  import spark.implicits._

  test("preprocess_name pipeline cleans names") {
    val df  = Seq("  Hello—World!  ", "Café B.V.", null).toDF("name")
    val out = Preprocessor(df, "preprocess_name").collect().map(_.getString(1))
    assert(out(0) == "hello world")
    assert(out(1) == "cafe b v")
    assert(out(2) == "")
  }

  test("preprocess_merge_abbr merges abbreviations then lowers") {
    val df  = Seq("ING BANK B.V.", "H & M Stores Limited").toDF("name")
    val out = Preprocessor(df, "preprocess_merge_abbr").collect().map(_.getString(1))
    assert(out(0) == "ing bank bv")
    assert(out(1) == "hm stores ltd")
  }
}
