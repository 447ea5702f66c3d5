package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-parse JSON-LD graph normalization for REAL worldcat payloads
  * (ref `oclc/linked_data.py:317-330` typed-node scan, `:560-640`
  * extract_useful_data). The captured documents are heterogeneous in
  * exactly the ways a fixed `from_json` schema can't express: `@type`
  * is a string OR an array, `name`/`description` values are plain
  * strings OR `{"@language","@value"}` objects OR arrays of either.
  * One Jackson parse per document in `mapPartitions` normalizes every
  * node to a uniform row; graph-internal references then resolve with
  * ordinary equi-joins (`resolvePublishers`). `JsonLd.explodeGraph`
  * remains the expression-form path for schema-regular documents.
  */
object JsonLdKernel {

  /** One name/description value: `lang` None for plain strings. */
  final case class LdValue(lang: Option[String], value: String)

  /** One normalized JSON-LD graph node. */
  final case class LdNode(
      key: String,
      node_id: String,
      node_types: Array[String],
      names: Array[LdValue],
      descriptions: Array[LdValue],
      creator_refs: Array[String],
      publisher_refs: Array[String],
      about_refs: Array[String],
      work_example_refs: Array[String],
      oclcnum: Option[String],
      date_published: Option[String])

  private def asSeq(n: JsonNode): Seq[JsonNode] =
    if (n == null || n.isNull) Seq.empty
    else if (n.isArray) (0 until n.size).map(n.get)
    else Seq(n)

  /** "ldq" value normalization (ref `linked_data.py:560-575`): scalar
    * or array, each element a string or an @value object. */
  private def values(n: JsonNode): Array[LdValue] =
    asSeq(n).flatMap { v =>
      if (v.isTextual) Some(LdValue(None, v.asText))
      else if (v.isObject && v.has("@value"))
        Some(LdValue(Option(v.get("@language")).map(_.asText),
                     v.get("@value").asText))
      else None
    }.toArray

  private def strings(n: JsonNode): Array[String] =
    asSeq(n).filter(_.isTextual).map(_.asText).toArray

  private def scalar(n: JsonNode): Option[String] =
    asSeq(n).find(_.isTextual).map(_.asText)

  private[sources] def parseDoc(mapper: ObjectMapper, key: String,
                                json: String): Iterator[LdNode] = {
    val root =
      try mapper.readTree(if (json == null) "{}" else json)
      catch { case _: Exception => mapper.createObjectNode() }
    asSeq(root.get("@graph")).iterator.filter(_.isObject).map { node =>
      LdNode(
        key = key,
        node_id = Option(node.get("@id")).map(_.asText).getOrElse(""),
        node_types = strings(node.get("@type")),
        names = values(node.get("name")),
        descriptions = values(node.get("description")),
        creator_refs = strings(node.get("creator")),
        publisher_refs = strings(node.get("publisher")),
        about_refs = strings(node.get("about")),
        work_example_refs = strings(node.get("workExample")),
        oclcnum = scalar(node.get("oclcnum")),
        date_published = scalar(node.get("datePublished")))
    }
  }

  /** One row per graph node across all documents; `key` keeps the
    * caller's column type. Narrow per-row flatMap — no shuffle. */
  def normalizeGraph(docs: DataFrame, keyCol: String, jsonCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyType = docs.schema(keyCol).dataType
    docs.select(col(keyCol).cast("string").as("_1"),
                col(jsonCol).cast("string").as("_2"))
      .as[(String, String)]
      .mapPartitions { it =>
        val mapper = new ObjectMapper()
        it.flatMap { case (k, json) => parseDoc(mapper, k, json) }
      }
      .toDF()
      .withColumn("key", col("key").cast(keyType))
  }

  /** Book nodes (`@type` contains schema:Book, ref
    * `linked_data.py:317-330`) with their publisher agent names
    * resolved through the graph-internal reference — the dict lookup
    * the reference does per document, as one equi-join on
    * (document, node id). */
  def resolvePublishers(nodes: DataFrame): DataFrame = {
    val books = nodes
      .filter(array_contains(col("node_types"), "schema:Book"))
      .select(col("key"), col("node_id").as("book_id"), col("oclcnum"),
        get(col("names"), lit(0)).getField("value").as("title"),
        col("date_published"),
        explode_outer(col("publisher_refs")).as("publisher_ref"))
    val agents = nodes
      .filter(array_contains(col("node_types"), "bgn:Agent"))
      .select(col("key").as("a_key"), col("node_id").as("agent_id"),
        get(col("names"), lit(0)).getField("value").as("publisher_name"))
    books.join(agents,
        books("key") === col("a_key") &&
        col("publisher_ref") === col("agent_id"), "left")
      .select(books("key"), col("book_id"), col("oclcnum"), col("title"),
              col("date_published"), col("publisher_name"))
  }
}
