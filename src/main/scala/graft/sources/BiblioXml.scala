package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S2/S3 — snapshot-table XML extraction for the VIAF SRU and OCLC
  * Classify services (F13). The reference fetches these over HTTP with
  * a 6-month `Representation` cache (`viaf.py:831-841`,
  * `oclc/classify.py:1060-1084`); the engine models each service as a
  * SNAPSHOT TABLE of (key, xml) rows refreshed out-of-band, and
  * extraction is pure xpath over that table — so the relational core
  * never blocks on the network (SURVEY.md §7 hard-part 4).
  */
object BiblioXml {

  // ---- OCLC Classify (ref oclc/classify.py:68-94, 253-341) ----

  /** Response code from a Classify document (`//response/@code`). */
  def classifyResponseCode(xml: Column): Column =
    xpath_int(xml, lit("string(//*[local-name()='response']/@code)"))

  /** Work identifiers from a multi-work response: each `<work>`'s owi
    * attribute (ref `oclc/classify.py:81-94`). Returns an array. */
  def classifyOwis(xml: Column): Column =
    xpath(xml, lit("//*[local-name()='work']/@owi"))

  /** Title/author of the single-work response header. */
  def classifyTitle(xml: Column): Column =
    xpath_string(xml, lit("string(//*[local-name()='work']/@title)"))
  def classifyAuthor(xml: Column): Column =
    xpath_string(xml, lit("string(//*[local-name()='work']/@author)"))

  /** Most-popular DDC / LCC headings (ref `oclc/classify.py:271-341`:
    * `ddc/mostPopular@sfa`, `lcc/mostPopular@sfa`). */
  def classifyDdc(xml: Column): Column =
    xpath_string(xml, lit("string(//*[local-name()='ddc']/*[local-name()='mostPopular']/@sfa)"))
  def classifyLcc(xml: Column): Column =
    xpath_string(xml, lit("string(//*[local-name()='lcc']/*[local-name()='mostPopular']/@sfa)"))

  /** Parse a Classify snapshot table (key, xml) into work rows:
    * one row per OWI with the shared title/author/ddc/lcc. ONE document
    * parse per row (`XmlKernels.classifyDocs`) — the per-field xpath
    * expressions above re-parse the doc once per call (6× here) and are
    * kept for ad-hoc single-field extraction only. */
  def parseClassify(snapshot: DataFrame, keyCol: String, xmlCol: String): DataFrame =
    XmlKernels.classifyDocs(snapshot, keyCol, xmlCol)
      .select(col("key"), col("response_code"), col("title"), col("author"),
              col("ddc"), col("lcc"), explode_outer(col("owis")).as("owi"))

  /** Full single-parse Classify extraction: adds the `<authors>` block
    * (text + lc/viaf ids, ref `oclc/classify.py:485-529`),
    * holdings/editions measurements, pswid, DDC/LCC heading weights and
    * the FAST recommendation headings — one row per document. */
  def parseClassifyFull(snapshot: DataFrame, keyCol: String, xmlCol: String): DataFrame =
    XmlKernels.classifyDocs(snapshot, keyCol, xmlCol)

  // ---- VIAF SRU (ref viaf.py:277-304, 584-604) ----

  /** Cluster VIAF id (`//viafID`). */
  def viafId(xml: Column): Column =
    xpath_string(xml, lit("//*[local-name()='viafID']/text()"))

  /** All sort names from MARC21 100$a datafields in a cluster (ref
    * `viaf.py:584-604` sort_names_for_cluster). */
  def viafSortNames(xml: Column): Column =
    xpath(xml, lit(
      "//*[local-name()='datafield'][@dtype='MARC21'][@tag='100']/*[local-name()='subfield'][@code='a']/text()"))

  /** Work titles attached to the cluster (ref `viaf.py:630-634`). */
  def viafTitles(xml: Column): Column =
    xpath(xml, lit(
      "//*[local-name()='titles']/*[local-name()='work']/*[local-name()='title']/text()"))

  /** Parse a VIAF snapshot table into (key, viaf_id, sort_name) rows —
    * one row per candidate sort name, ordinal preserved (encounter
    * order drives the reference's popularity prior, `viaf.py:497`).
    * ONE document parse per row via `XmlKernels.viafClusters` (covers
    * MARC21 100 AND 110 corporate headings, ref `viaf.py:288-295`). */
  def parseViafClusters(snapshot: DataFrame, keyCol: String, xmlCol: String): DataFrame =
    XmlKernels.viafClusters(snapshot, keyCol, xmlCol)
      .select(col("key"), col("viaf_id"), posexplode_outer(col("sort_names")))
      .withColumnRenamed("pos", "ordinal")
      .withColumnRenamed("col", "sort_name")

  /** Full single-parse cluster extraction: adds alternate-name forms
    * (MARC21 400/700 $a, ref `viaf.py:277-285`), UNIMARC nameparts
    * (ref `viaf.py:707-726`), the Wikipedia source name (ref
    * `viaf.py:522-530`) and attributed work titles — one row per
    * cluster with array/struct columns. */
  def parseViafFull(snapshot: DataFrame, keyCol: String, xmlCol: String): DataFrame =
    XmlKernels.viafClusters(snapshot, keyCol, xmlCol)
}
