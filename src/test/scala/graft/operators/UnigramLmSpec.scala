package graft.operators

import graft.{PropSupport, SparkSpec}
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll

class UnigramLmSpec extends SparkSpec with PropSupport {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("train: substring frequencies, all single chars kept, qlp formula") {
    // corpus: "abab ab" ×2 — substrings of ab/abab weighted by counts
    val vocab = UnigramLm.train(docs("abab ab", "abab ab"), "text",
      vocabMulti = 3, maxPieceLen = 4)
    val byPiece = vocab.map(v => v.piece -> v).toMap
    // word counts: abab→2, ab→2.
    // freq(a) = (2 per abab)·2 + (1 per ab)·2 = 6; freq(b) same.
    // multi: ab = 3·2+1·2 = 8? occurrences of "ab" in abab: i=0,2 → 2;
    //   in ab: 1 → freq = 2·2+1·2 = 6; ba: 1 in abab → 2; bab/aba: 2
    //   each; abab: 2.
    assert(byPiece("a").freq == 6 && byPiece("b").freq == 6)
    assert(byPiece("ab").freq == 6)
    // top-3 multi by (freq desc, piece asc): ab(6), aba(2), abab(2)
    assert(vocab.map(_.piece).toSet == Set("a", "b", "ab", "aba", "abab"))
    val total = vocab.map(_.freq).sum
    val exp = java.math.BigDecimal
      .valueOf(math.log(6.0 / total) * 1000000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    assert(byPiece("ab").qlp == exp)
  }

  test("viterbi: max-likelihood split, fewer-pieces tie-break, unk fallback") {
    // qlp chosen so "ab"+"ab" (2 pieces) beats "a"+"b"+"a"+"b" and
    // also beats "abab" when its prob is low enough
    val q = Map("a" -> -3000000L, "b" -> -3000000L, "ab" -> -2000000L,
      "abab" -> -3500000L)
    assert(UnigramLm.viterbiPieces("abab", q, 4) == 1) // -3.5e6 beats 2·-2e6
    val q2 = q.updated("abab", -9000000L)
    assert(UnigramLm.viterbiPieces("abab", q2, 4) == 2) // ab+ab wins
    // exact tie between "abab"(1 piece, -4e6) and "ab ab"(2, -4e6):
    // fewer pieces wins via the −nPieces term
    val q3 = Map("a" -> -9000000L, "b" -> -9000000L, "ab" -> -2000000L,
      "abab" -> -4000000L)
    assert(UnigramLm.viterbiPieces("abab", q3, 4) == 1)
    // unknown char: single-char UnkQlp fallback keeps it feasible
    assert(UnigramLm.viterbiPieces("axb", Map("a" -> -1L, "b" -> -1L), 4) == 3)
  }

  test("tokenize: per-doc accounting with memoized words") {
    val corpus = docs("abab ab abab", "ab", "")
    val vocab = UnigramLm.train(corpus, "text")
    val out = UnigramLm.tokenize(corpus, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // full vocab (multi 256) keeps "abab" and "ab" as whole pieces
    assert(out(0) == ((0L, 3L, 3L, 1.0)))
    assert(out(1) == ((1L, 1L, 1L, 1.0)))
    assert(out(2) == ((2L, 0L, 0L, 0.0)))
  }

  test("astral characters index by codepoint, matching the oracle's substr semantics") {
    val astral = new String(Character.toChars(0x1D7D8)) // one codepoint, 2 UTF-16 units
    val w = "a" + astral + "b"
    // three single-codepoint pieces — UTF-16 indexing would see 4 units
    // and produce mangled lone-surrogate pieces
    val q = Map("a" -> -1000000L, "b" -> -1000000L, astral -> -1000000L)
    assert(UnigramLm.viterbiPieces(w, q, 4) == 3)
    // training on an astral corpus yields whole-codepoint pieces only
    val vocab = UnigramLm.train(docs(w + " " + w), "text", 8, 2)
    assert(vocab.exists(_.piece == astral))
    assert(vocab.forall(v => !v.piece.exists(Character.isSurrogate)
      || v.piece.codePoints.toArray.forall(Character.isValidCodePoint)))
    assert(vocab.forall(v => v.piece.codePointCount(0, v.piece.length) <= 2))
  }

  test("long words decode exact piece counts (no mod wrap) and huge words fail loudly") {
    // 40 single-char pieces: a mod-32 packing would decode 40 % 32 = 8
    val q = Map("z" -> -1000000L)
    val w40 = "z" * 40
    assert(UnigramLm.viterbiPieces(w40, q, 4) == 40)
    val huge = "z" * 5000
    intercept[IllegalArgumentException] {
      UnigramLm.viterbiPieces(huge, q, 4)
    }
  }

  test("property: piece count stays within [ceil(len/4), len]") {
    val word = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = docs("abc ab a cab bca abca")
    val vocab = UnigramLm.train(corpus, "text")
    val q = vocab.map(v => v.piece -> v.qlp).toMap
    checkN("piece-count bounds", 100)(forAll(word) { w =>
      val p = UnigramLm.viterbiPieces(w, q, 4)
      p >= (w.length + 3) / 4 && p <= w.length
    })
  }
}
