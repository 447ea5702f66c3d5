package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("S11: CSV report round-trips with header") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/report"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "score")
    Sinks.writeCsvReport(df, dir)
    val back = Sinks.readCsvReport(spark, dir).orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getString(1) == "alpha" && back(1).getDouble(2) == 2.5)
  }

  test("S8: consolidated N-Triples cache round-trips through parquet") {
    val dir = Files.createTempDirectory("graft-nt").toString + "/fast"
    val lines = Seq(
      """<http://id.worldcat.org/fast/42> <http://schema.org/name> "Forty-two" .""")
      .toDF("value")
    val parsed = NTriples.parseFast(lines)
    NTriples.writeConsolidated(parsed, dir)
    val back = NTriples.readConsolidated(spark, dir).collect()
    assert(back.length == 1)
    assert(back(0).getString(0) == "42" && back(0).getString(1) == "Forty-two")
  }
}
