package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** weigh_titles behavior spec (ref `viaf.py:235-273`): first-match
  * per known title, exact-unfluffed beats fuzzy, accumulation across
  * known titles, strict-mode outer break.
  */
class ViafScoringSpec extends AnyFunSuite {

  test("exact unfluffed match scores 0.8·90 and short-circuits the fuzzy path") {
    // "The Book." unfluffs to "book" == unfluffed known "Book"
    assert(ViafScoring.weighTitles(Seq("Book"), Seq("The Book.")) == 72.0)
    // periods-insensitive equality (name_matches, viaf.py:127-130)
    assert(ViafScoring.weighTitles(Seq("U.S. Grant"), Seq("US Grant")) == 72.0)
  }

  test("fuzzy >80 contributes 0.6·ratio; <=80 contributes nothing") {
    // "Book 123" vs "Book 123x": ratio 89 -> 53.4
    assert(ViafScoring.weighTitles(Seq("Book 123"), Seq("Book 123x")) == 53.4)
    assert(ViafScoring.weighTitles(Seq("Book"), Seq("Completely Other")) == 0.0)
  }

  test("only the FIRST matching cluster title counts per known title") {
    // the non-matching first title is skipped, the second matches exact
    assert(ViafScoring.weighTitles(
      Seq("Book"), Seq("Book 1x", "The Book.")) == 72.0)
    // the first title fuzzy-matches, so the exact second is never reached
    assert(ViafScoring.weighTitles(
      Seq("Book 123"), Seq("Book 123x", "Book 123")) == 53.4)
  }

  test("contributions accumulate across known titles") {
    assert(ViafScoring.weighTitles(
      Seq("Book", "Saga: special edition"),
      Seq("The Book.", "The Saga: special edition!!")) == 144.0)
  }

  test("strict mode: exact membership only, stops at the first hit") {
    assert(ViafScoring.weighTitles(
      Seq("A", "B"), Seq("A", "B"), strict = true) == 80.0)
    // fuzzy/unfluff paths are disabled in strict mode
    assert(ViafScoring.weighTitles(
      Seq("Book"), Seq("The Book."), strict = true) == 0.0)
  }

  test("null-safety") {
    assert(ViafScoring.weighTitles(null, Seq("x")) == 0.0)
    assert(ViafScoring.weighTitles(Seq("x"), null) == 0.0)
    assert(ViafScoring.weighTitles(Seq(null, "Book"), Seq(null, "The Book.")) == 72.0)
  }
}
