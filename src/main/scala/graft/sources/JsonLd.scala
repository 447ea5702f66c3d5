package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4/F14 — OCLC Linked Data JSON-LD graph operations (ref
  * `oclc/linked_data.py:45-89` @graph extraction, `317-330` typed-node
  * scan, `611-613` @language-restricted values). A JSON-LD document is
  * a bag of nodes under `@graph`; the reference walks it in Python —
  * here it's `from_json` → one explode → filters, and the internal
  * `@id` reference lookup is a self-join on node id.
  */
object JsonLd {

  val valueSchema: StructType = StructType(Seq(
    StructField("@language", StringType),
    StructField("@value", StringType)))

  val nodeSchema: StructType = StructType(Seq(
    StructField("@id", StringType),
    StructField("@type", StringType),
    StructField("name", ArrayType(valueSchema)),
    StructField("creator", StringType)))   // internal @id reference

  val docSchema: StructType = StructType(Seq(
    StructField("@graph", ArrayType(nodeSchema))))

  /** Explode a JSON-LD document column into one row per graph node. */
  def explodeGraph(df: DataFrame, keyCol: String, jsonCol: String): DataFrame =
    df.select(col(keyCol).as("key"),
        from_json(col(jsonCol), docSchema).as("doc"))
      .select(col("key"), explode(col("doc.`@graph`")).as("node"))
      .select(col("key"),
        col("node.`@id`").as("node_id"),
        col("node.`@type`").as("node_type"),
        col("node.name").as("names"),
        col("node.creator").as("creator_ref"))

  /** @language-restricted value: first name value in the requested
    * language (ref `linked_data.py:611-613`). */
  def nameInLanguage(names: Column, language: String): Column =
    get(filter(names, v => v.getField("@language") === language), lit(0))
      .getField("@value")

  /** Typed-node scan + internal @id dereference: for every node of
    * `fromType`, resolve its `creator` reference against the same
    * graph's nodes of `toType` — the self-join the reference does with
    * a Python dict lookup (`linked_data.py:611-613`).
    */
  def resolveCreators(nodes: DataFrame, fromType: String = "CreativeWork",
                      toType: String = "Person",
                      language: String = "en"): DataFrame = {
    val works = nodes.filter(col("node_type") === fromType)
      .select(col("key"), col("node_id").as("work_id"),
        nameInLanguage(col("names"), language).as("work_name"),
        col("creator_ref"))
    val people = nodes.filter(col("node_type") === toType)
      .select(col("key"), col("node_id").as("person_id"),
        nameInLanguage(col("names"), language).as("creator_name"))
    works.join(people,
        works("key") === people("key") &&
        col("creator_ref") === col("person_id"), "left")
      .select(works("key"), col("work_id"), col("work_name"),
              col("creator_name"))
  }
}
