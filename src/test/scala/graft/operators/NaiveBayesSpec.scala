package graft.operators

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // two cleanly-separated classes plus one ambiguous doc
  private val docs = Seq(
    (0L, "sport", "goal goal match team"),
    (1L, "sport", "team match goal"),
    (2L, "tech", "code build deploy code"),
    (3L, "tech", "deploy build code"),
    (4L, "sport", "goal code") // mixed: sport evidence dominates
  ).toDF("doc_id", "source", "text")

  test("train: dense class×vocab model with Laplace-smoothed quantized qlp") {
    val m = NaiveBayes.train(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val vocab = Set("goal", "match", "team", "code", "build", "deploy")
    assert(m.size == 2 * vocab.size) // dense: every class × word
    // sport counts: goal 4, match 2, team 2, code 1, build/deploy 0; ct=9
    assert(m(("sport", "goal"))._1 == 4L)
    assert(m(("sport", "build"))._1 == 0L) // unseen pair present, n=0
    val expected = java.math.BigDecimal
      .valueOf(math.log(5.0 / (9 + 6)) * 1000000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    assert(m(("sport", "goal"))._2 == expected)
  }

  test("classify: argmax with priors recovers the classes; mixed doc follows evidence") {
    val out = NaiveBayes.classify(docs, "doc_id", "source", "text",
        NaiveBayes.train(docs, "source", "text"),
        NaiveBayes.priors(docs, "source"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(4)))
    assert(out.map(_._2).toSeq ==
      Seq("sport", "sport", "tech", "tech", "sport"))
    assert(out.forall(_._3))
  }

  test("classify keeps vocabulary-less documents with null prediction") {
    val withEmpty = docs.union(Seq((9L, "sport", "")).toDF("doc_id", "source", "text"))
    val out = NaiveBayes.classify(withEmpty, "doc_id", "source", "text",
        NaiveBayes.train(docs, "source", "text"),
        NaiveBayes.priors(docs, "source"))
      .orderBy("doc_id").collect()
    assert(out.length == 6) // never silently dropped
    val empty = out.last
    assert(empty.getLong(0) == 9L && empty.isNullAt(2) && empty.isNullAt(4))
  }

  test("classify plan: model joins on the word key, never a doc-stream cross join") {
    val plan = NaiveBayes.classify(docs, "doc_id", "source", "text",
        NaiveBayes.train(docs, "source", "text"),
        NaiveBayes.priors(docs, "source"))
      .queryExecution.executedPlan.toString
    // exactly the one intended dense node (the classes×vocab model
    // build); the classify side itself is equi-joins
    val dense = "CartesianProduct".r.findAllMatchIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).size
    assert(dense <= 1, s"unexpected dense joins:\n$plan")
  }
}
