package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: String*): Seq[(Int, Int, String)] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), Pii.phoneCount(col("t")), Pii.emailCount(col("t")),
        Pii.redact(col("t")))
      .orderBy("id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq

  test("phones and emails are counted and masked, other text untouched") {
    val got = run(
      "call 25-989-741-2988 or mail jane.doe+x@mail.example.org now",
      "no pii here at all",
      "two phones 11-222-333-4444 and 55-666-777-8888",
      "a@b.co and c_d%e@sub.domain.io")
    assert(got == Seq(
      (1, 1, "call [PHONE] or mail [EMAIL] now"),
      (0, 0, "no pii here at all"),
      (2, 0, "two phones [PHONE] and [PHONE]"),
      (0, 2, "[EMAIL] and [EMAIL]")))
  }

  test("near-misses do not match") {
    val got = run(
      "1-222-333-4444",        // 1-digit area block
      "25-989-741-298",        // short tail
      "user@nodot",            // TLD-less
      "@example.com")          // empty local part
    got.zipWithIndex.foreach { case ((p, e, _), i) =>
      assert(p == 0 && e == 0, s"case $i: $got")
    }
  }

  test("phone-shaped substring inside an email local part: email wins whole") {
    val got = run("mail jane.25-989-741-2988@corp.example.com or 11-222-333-4444")
    // email masked as a unit (no leaked "jane." remainder), phone still found
    assert(got == Seq((2, 1, "mail [EMAIL] or [PHONE]")))
  }

  test("masks cannot cascade: a redacted string re-redacts to itself") {
    val s = "ping 12-345-678-9012 x bob@corp.example.com"
    val once = run(s).head._3
    val twice = Seq((0L, once)).toDF("id", "t")
      .select(Pii.redact(col("t"))).collect().head.getString(0)
    assert(once == twice)
  }
}
