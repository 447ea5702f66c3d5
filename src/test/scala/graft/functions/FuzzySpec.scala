package graft.functions

import graft.PropSupport
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

class FuzzySpec extends AnyFunSuite with PropSupport {

  test("levenshtein examples") {
    assert(Fuzzy.levenshtein("kitten", "sitting") == 3)
    assert(Fuzzy.levenshtein("", "abc") == 3)
    assert(Fuzzy.levenshtein("abc", "") == 3)
    assert(Fuzzy.levenshtein("same", "same") == 0)
    assert(Fuzzy.levenshtein("flaw", "lawn") == 2)
  }

  test("ratio scale and bounds") {
    assert(Fuzzy.ratio("abc", "abc") == 100)
    assert(Fuzzy.ratio("abc", "xyz") == 0)
    assert(Fuzzy.ratio("", "") == 100)
    assert(Fuzzy.ratio(null, "x") == 0)
    assert(Fuzzy.ratio(null, null) == 100)
  }

  test("token sort makes name order irrelevant") {
    assert(Fuzzy.tokenSortRatio("Martin Dugard", "Dugard, Martin") == 100)
    assert(Fuzzy.tokenSortRatio("J. R. R. Tolkien", "Tolkien, J. R. R.") == 100)
    // threshold discipline matches the reference's >90 "sure match"
    assert(Fuzzy.contributorNameMatchRatio("Baxter, Charles", "Charles Baxter") > 90)
    assert(Fuzzy.contributorNameMatchRatio("Baxter, Charles", "Jane Austen") < 60)
  }

  test("title ratio keeps sequence") {
    assert(Fuzzy.titleMatchRatio("The Time Machine", "the time machine!") == 100)
    assert(Fuzzy.titleMatchRatio("Dog Bites Man", "Man Bites Dog") < 100)
  }

  test("property: levenshtein is a metric") {
    check("metric")(forAll { (a: String, b: String) =>
      val d = Fuzzy.levenshtein(a, b)
      d >= 0 && d == Fuzzy.levenshtein(b, a) &&
        ((d == 0) == (a == b)) && d <= math.max(a.length, b.length)
    })
  }

  test("property: ratio within [0,100]") {
    check("ratio bounds")(forAll { (a: String, b: String) =>
      val r = Fuzzy.ratio(a, b)
      r >= 0 && r <= 100
    })
  }

  test("property: triangle inequality") {
    check("triangle")(forAll { (a: String, b: String, c: String) =>
      Fuzzy.levenshtein(a, c) <=
        Fuzzy.levenshtein(a, b) + Fuzzy.levenshtein(b, c)
    })
  }
}
