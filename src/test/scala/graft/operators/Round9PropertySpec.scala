package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the round's operators against local references
  * independent of the Spark plans: UniMax must conserve the budget and
  * honor every cap for ANY supply distribution, and BPE tokenization
  * must conserve symbols (pieces per word shrink by exactly one per
  * applied merge occurrence, and piece-count totals replay from the
  * learned merge table).
  */
class Round9PropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: UniMax conserves budget, honors caps, waterlines correctly") {
    val gen = for {
      n <- Gen.chooseNum(1, 12)
      supplies <- Gen.listOfN(n, Gen.chooseNum(1L, 5000L))
      epochs <- Gen.chooseNum(1, 4)
    } yield (supplies, epochs)
    val prop = Prop.forAll(gen) { case (supplies, epochs) =>
      val rows = supplies.zipWithIndex.map { case (s, i) => (s"d$i", s) }
      val got = Unimax.epochAllocation(rows.toDF("src", "n"), "src", "n",
          maxEpochs = epochs)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val budget = supplies.sum
      val capSum = supplies.map(_ * epochs).sum
      val allocSum = got.map(_._4).sum
      // caps respected; budget used fully unless caps bind first
      got.forall { case (_, s, c, a) => c == s * epochs && a >= 0 && a <= c } &&
        allocSum == math.min(budget, capSum) &&
        // greedy replay: ascending by (cap, key), each gets
        // min(cap, fair share of what remains) — the closed form must
        // match the loop it replaced
        {
          val sorted = got.sortBy { case (k, _, c, _) => (c, k) }
          var remaining = budget
          var left = sorted.length
          sorted.forall { case (_, _, c, a) =>
            val fair = remaining / left // floor; remainder spreads +1
            val fairUp = if (remaining % left > 0) fair + 1 else fair
            val ok = (a == math.min(c, fair)) || (a == math.min(c, fairUp))
            remaining -= a; left -= 1
            ok
          } && remaining == math.max(0L, budget - capSum)
        }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(r.passed, r.status.toString)
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  test("property: BPE piece counts conserve symbols minus applied merges") {
    val gen = Gen.listOfN(5, Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" "))))
    val prop = Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 3
      val merges = BpeTrain.trainMerges(df, "text", merges = k)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2)))
      val got = BpeTrain.tokenizedCounts(df, "doc_id", "text", merges = k)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      // local replay: apply the learned merges greedily left-to-right
      def pieces(w: String): Long = {
        var seq = w.map(_.toString).toList
        for ((l, r) <- merges) {
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < seq.length) {
            if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += seq(i); i += 1 }
          }
          seq = out.toList
        }
        seq.length.toLong
      }
      docs.zipWithIndex.forall { case (t, i) =>
        val ws = t.split(" ", -1).filter(_.nonEmpty)
        val (nw, np) = (ws.length, ws.map(pieces).sum)
        got.get(i.toLong).forall { case (w, p) => w == nw && p == np } &&
          (ws.nonEmpty == got.contains(i.toLong))
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }
}
