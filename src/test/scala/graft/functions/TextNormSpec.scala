package graft.functions

import graft.PropSupport
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

class TextNormSpec extends AnyFunSuite with PropSupport {

  test("year extraction examples (ref oclc/linked_data.py:408-432)") {
    assert(TextNorm.extractYear("1999,") == "1999")
    assert(TextNorm.extractYear("1999") == "1999")
    assert(TextNorm.extractYear("19990401") == "1999")
    assert(TextNorm.extractYear("1999-04-01") == "1999")
    assert(TextNorm.extractYear("04/01/1999") == "1999")
    assert(TextNorm.extractYear("01-1999") == "1999")
    assert(TextNorm.extractYear("99") == null)
    assert(TextNorm.extractYear("") == null)
    assert(TextNorm.extractYear(null) == null)
  }

  test("title unfluff: articles, punctuation, anthologies (F7)") {
    assert(TextNorm.unfluffTitle("The Time Machine") == "time machine")
    assert(TextNorm.unfluffTitle("A Study in Scarlet.") == "study in scarlet")
    assert(TextNorm.unfluffTitle("The An Apple") == "an apple" ||
           TextNorm.unfluffTitle("The An Apple") == "apple") // nested articles both strip
    assert(TextNorm.isAnthologyTitle("Novels ; Short stories"))
    assert(!TextNorm.isAnthologyTitle("Plain title"))
    assert(TextNorm.titleSimilarity("The Time Machine", "time machine!") == 1.0)
    assert(TextNorm.titleSimilarity("The Time Machine", "War of the Worlds") < 0.5)
  }

  test("nfkd lower strips accents and case") {
    assert(TextNorm.nfkdLower("Café") == "cafe")
    assert(TextNorm.nfkdLower("BRONTË") == "bronte")
    assert(TextNorm.nfkdLower("ﬁ") == "fi") // compatibility ligature
  }

  test("normalizeForMatching collapses punctuation") {
    assert(TextNorm.normalizeForMatching("O'Reilly, Bill!") == "o reilly bill")
    assert(TextNorm.normalizeForMatching("  The--Time  Machine ") == "the time machine")
  }

  test("permanent work id is punctuation/case/accents-insensitive") {
    val a = TextNorm.permanentWorkId("The Time Machine", "H. G. Wells")
    assert(a == TextNorm.permanentWorkId("the  time,  machine!", "h g wells"))
    assert(a == TextNorm.permanentWorkId("THE TIME MACHINE", "H-G-WELLS"))
    assert(a != TextNorm.permanentWorkId("The Time Machine", "Jules Verne"))
    assert(a.matches("[0-9a-f]{32}"))
  }

  test("property: work id is a stable md5 hex, case-insensitive on ASCII") {
    val ascii = org.scalacheck.Gen.asciiPrintableStr
    check("work id")(forAll(ascii, ascii) { (t, a) =>
      val id = TextNorm.permanentWorkId(t, a)
      id.matches("[0-9a-f]{32}") &&
        id == TextNorm.permanentWorkId(t.toUpperCase, a.toUpperCase)
    })
  }
}
