package graft.sources

import graft.{PropSupport, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Randomized-structure equivalence: the single-parse kernels must
  * match the xpath expression pipeline on ARBITRARY document shapes —
  * any mix of datafield dtypes/tags/subfields, missing viafID, empty
  * work lists, multiple response elements — not just the fixed shapes
  * the synthesized queries emit. Batched: each ScalaCheck case is a
  * whole batch of documents compared in one Spark job.
  */
class XmlKernelsPropSpec extends SparkSpec with PropSupport {
  import spark.implicits._

  private val word = Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString)
  private val text = Gen.listOfN(2, word).map(_.mkString(" "))

  private val datafield: Gen[String] = for {
    dtype <- Gen.oneOf("MARC21", "UNIMARC", "OTHER")
    tag <- Gen.oneOf("100", "110", "200", "400", "700", "950")
    n <- Gen.choose(0, 3)
    codes <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    values <- Gen.listOfN(n, text)
  } yield {
    val subs = codes.zip(values)
      .map { case (c, v) => s"""<subfield code="$c">$v</subfield>""" }
      .mkString
    s"""<datafield dtype="$dtype" tag="$tag">$subs</datafield>"""
  }

  private val viafDoc: Gen[String] = for {
    id <- Gen.option(Gen.choose(1, 999999))
    nFields <- Gen.choose(0, 5)
    fields <- Gen.listOfN(nFields, datafield)
    titles <- Gen.listOfN(2, text)
    withTitles <- Gen.oneOf(true, false)
  } yield {
    val idXml = id.map(i => s"<viafID>$i</viafID>").getOrElse("")
    val titleXml =
      if (withTitles)
        s"<titles>${titles.map(t => s"<work><title>$t</title></work>").mkString}</titles>"
      else ""
    s"<VIAFCluster>$idXml${fields.mkString}$titleXml</VIAFCluster>"
  }

  private val classifyDoc: Gen[String] = for {
    code <- Gen.option(Gen.choose(0, 200))
    nWorks <- Gen.choose(0, 4)
    owis <- Gen.listOfN(nWorks, Gen.choose(1, 99999))
    withTitle <- Gen.oneOf(true, false)
    title <- text
    withHeadings <- Gen.oneOf(true, false)
    ddc <- word
  } yield {
    val resp = code.map(c => s"""<response code="$c"/>""").getOrElse("")
    val works = owis.map { o =>
      val t = if (withTitle) s""" title="$title" author="A $o"""" else ""
      s"""<work owi="$o"$t/>"""
    }.mkString
    val heads =
      if (withHeadings)
        s"""<ddc><mostPopular sfa="$ddc"/></ddc><lcc><mostPopular sfa="L$ddc"/></lcc>"""
      else ""
    s"<classify>$resp<works>$works</works>$heads</classify>"
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("property: VIAF kernel == xpath pipeline on arbitrary cluster shapes") {
    checkN("viaf-equivalence", 25)(Prop.forAll(Gen.listOfN(30, viafDoc)) { docs =>
      val snap = docs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("k", "xml")
      val expected = snap.select(
          col("k").as("key"),
          xpath_string(col("xml"), lit("//*[local-name()='viafID']/text()")).as("viaf_id"),
          posexplode_outer(xpath(col("xml"), lit(
            "//*[local-name()='datafield'][@dtype='MARC21'][@tag='100' or @tag='110']/*[local-name()='subfield'][@code='a']/text()"))))
        .withColumnRenamed("pos", "ordinal")
        .withColumnRenamed("col", "sort_name")
      sortedRows(BiblioXml.parseViafClusters(snap, "k", "xml")) ==
        sortedRows(expected)
    })
  }

  test("property: Classify kernel == xpath pipeline on arbitrary response shapes") {
    checkN("classify-equivalence", 25)(Prop.forAll(Gen.listOfN(30, classifyDoc)) { docs =>
      val snap = docs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("k", "xml")
      val expected = snap.select(
          col("k").as("key"),
          when(xpath_string(col("xml"),
              lit("string(//*[local-name()='response']/@code)")) =!= "",
            xpath_int(col("xml"),
              lit("string(//*[local-name()='response']/@code)"))).as("response_code"),
          xpath_string(col("xml"), lit("string(//*[local-name()='work']/@title)")).as("title"),
          xpath_string(col("xml"), lit("string(//*[local-name()='work']/@author)")).as("author"),
          xpath_string(col("xml"), lit("string(//*[local-name()='ddc']/*[local-name()='mostPopular']/@sfa)")).as("ddc"),
          xpath_string(col("xml"), lit("string(//*[local-name()='lcc']/*[local-name()='mostPopular']/@sfa)")).as("lcc"),
          explode_outer(xpath(col("xml"), lit("//*[local-name()='work']/@owi"))).as("owi"))
      sortedRows(BiblioXml.parseClassify(snap, "k", "xml")) ==
        sortedRows(expected)
    })
  }
}
