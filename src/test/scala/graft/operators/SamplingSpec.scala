package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample: exact quota per stratum with floor of 1") {
    val df = (1L to 100L).map(i =>
        (i, if (i <= 90) "en" else if (i <= 99) "fr" else "de"))
      .toDF("doc_id", "lang")
    val out = Sampling.stratified(df, Seq("lang"), "doc_id", fraction = 0.2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 18) // ceil(0.2 * 90)
    assert(byLang("fr") == 2)  // ceil(0.2 * 9)
    assert(byLang("de") == 1)  // floor: ceil(0.2 * 1) = 1
  }

  test("stratified sample is deterministic (hash order, not rand)") {
    val df = (1L to 50L).map(i => (i, "en")).toDF("doc_id", "lang")
    val a = Sampling.stratified(df, Seq("lang"), "doc_id", 0.1)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratified(df, Seq("lang"), "doc_id", 0.1)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.length == 5)
  }
}
