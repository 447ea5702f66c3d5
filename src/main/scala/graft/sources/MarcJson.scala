package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S12 — MARC-in-JSON scan (ref `shadow_catalog.py:200-321`): each
  * record carries `varFields` (MARC tags with subfields); the parser
  * dispatches on tag number to produce title / contributors / subjects
  * / links. Spark-first: `from_json` into a typed schema, one explode,
  * then tag-dispatch with `when`/filters — no per-record Python walk.
  */
object MarcJson {

  val subfieldSchema: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("content", StringType)))

  val varFieldSchema: StructType = StructType(Seq(
    StructField("marcTag", StringType),
    StructField("subfields", ArrayType(subfieldSchema))))

  val recordSchema: StructType = StructType(Seq(
    StructField("varFields", ArrayType(varFieldSchema))))

  /** Parse a JSON column into exploded (recordId, ordinal, marcTag,
    * subfields) rows. The ordinal preserves field encounter order —
    * required for deterministic tag-preference picks when a record
    * repeats a tag. */
  def explodeVarFields(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol).as("record_id"),
        from_json(col(jsonCol), recordSchema).as("r"))
      .select(col("record_id"), posexplode(col("r.varFields")))
      .select(col("record_id"), col("pos").as("ordinal"),
              col("col.marcTag").as("marcTag"),
              col("col.subfields").as("subfields"))

  /** MARC subfield accessor (ref `shadow_catalog.py:127-148` tag.a /
    * tag.u — F16): first subfield with the given code. `get` (0-based)
    * is null-safe on empty arrays where ANSI `element_at` throws. */
  def subfield(subfields: Column, code: String): Column =
    get(filter(subfields, s => s.getField("tag") === code), lit(0))
      .getField("content")

  /** Title per record: first 245$a, falling back to 240$a (ref
    * `shadow_catalog.py:213-220`). The 245-preference sorts on
    * (tag priority, field ordinal) — the ordinal tie-break keeps the
    * pick deterministic when a record repeats a tag. */
  def titles(varFields: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("record_id"))
      .orderBy(when(col("marcTag") === "245", 0).otherwise(1),
               col("ordinal").asc)
    varFields
      .filter(col("marcTag").isin("245", "240"))
      .withColumn("title", subfield(col("subfields"), "a"))
      .filter(col("title").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("record_id"), col("title"))
  }

  /** Contributors: 100$a with role from $e defaulting to "author."
    * (ref `shadow_catalog.py:223-229`). */
  def contributors(varFields: DataFrame): DataFrame =
    varFields.filter(col("marcTag") === "100")
      .select(col("record_id"),
        subfield(col("subfields"), "a").as("sort_name"),
        coalesce(subfield(col("subfields"), "e"), lit("author.")).as("role"))
      .filter(col("sort_name").isNotNull)

  /** Subjects: LCC from 050/908$a, DDC from 082$a (ref
    * `shadow_catalog.py:232-252`). */
  def subjects(varFields: DataFrame): DataFrame =
    varFields.filter(col("marcTag").isin("050", "908", "082"))
      .select(col("record_id"),
        when(col("marcTag") === "082", "DDC").otherwise("LCC").as("subject_type"),
        subfield(col("subfields"), "a").as("identifier"))
      .filter(col("identifier").isNotNull)
}
