package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{Column, DataFrame}
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
      genres: Array[LdValue],
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
        genres = values(node.get("genre")),
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

  // ---- subject classification (ref `linked_data.py:474-600`) ----------

  /** Tags that are pointless or mark an unusable record (ref
    * `linked_data.py:155-173` POINTLESS_TAGS ∪ TAGS_FOR_UNUSABLE_RECORDS). */
  val FilterTags: Seq[String] = Seq(
    "large type", "large print", "(binding)", "movable books",
    "electronic books", "braille books", "board books",
    "electronic resource", "états-unis", "etats-unis", "ebooks",
    "audiobook", "audio book", "sound recording", "compact disc",
    "talking book", "books on cd", "audiocassettes", "playaway", "vhs")

  /** _fix_tag (ref `linked_data.py:616-623`): trailing dot stripped;
    * null when the lowercase form contains a filtered tag or is cd/cds. */
  def fixTag(tag: Column): Column = {
    val stripped = regexp_replace(tag, "\\.$", "")
    val l = lower(stripped)
    val filtered = FilterTags
      .map(t => l.contains(t))
      .reduce(_ || _) || l === "cd" || l === "cds"
    when(filtered, lit(null)).otherwise(stripped)
  }

  /** Publishers whose records are unusable (ref
    * `linked_data.py:127-137` + the Audio/Video/Tape/Comic/Music
    * substring rule at the consumption site). */
  val PublisherBlacklist: Seq[String] = Seq(
    "General Books", "Cliffs Notes", "North Books", "Emereo",
    "Emereo Publishing", "Kessinger", "Kessinger Publishing",
    "Kessinger Pub.", "Recorded Books")

  def isBlacklistedPublisher(name: Column): Column =
    name.isNotNull && (name.isin(PublisherBlacklist: _*) ||
      name.contains("Audio") || name.contains("Video") ||
      name.contains("Tape") || name.contains("Comic") ||
      name.contains("Music"))

  private val DeweyRe = "^http://dewey\\.info/class/([^/]+).*$"
  private val FastRe = "^http://id\\.worldcat\\.org/fast/([^/]+)$"
  private val LcshRe = "^http://id\\.loc\\.gov/authorities/subjects/((?:sh|jc)[^/]+)$"

  private def enName(names: org.apache.spark.sql.Column) =
    get(filter(names, v =>
      v.getField("lang").isNull || v.getField("lang") === "en"), lit(0))
      .getField("value")

  /** Subjects of every book node, the reference's `about`-walk as set
    * operations (`extract_useful_data`, `linked_data.py:508-585`):
    *  - genre values (en) become TAG subjects (trailing dot stripped);
    *  - `about` URIs classify by pattern — dewey.info→DDC,
    *    id.worldcat.org/fast→FAST, id.loc.gov sh-/jc-prefixed→LCSH — keeping
    *    the parsed id even with no graph node behind the URI;
    *  - otherwise the graph-internal node's @type decides (schema:Place
    *    → PLACE, Topic→TOPIC, Person→PERSON, Organization→ORG,
    *    Event→EVENT, CreativeWork→WORK, Intangible→TAG; the engine's
    *    canonical names for the reference's type constants), with the
    *    node's English name as the id;
    *  - unclassifiable URIs with no internal node drop.
    * The internal lookup is one (document, node-id) equi-join — the
    * reference's per-URI list scan, distributed. */
  def classifySubjects(nodes: DataFrame): DataFrame = {
    val books = nodes.filter(array_contains(col("node_types"), "schema:Book"))
    val genreTags = books
      .select(col("key"), col("node_id").as("book_id"),
              explode(col("genres")).as("g"))
      .filter(col("g.lang").isNull || col("g.lang") === "en")
      .select(col("key"), col("book_id"), lit("TAG").as("subject_type"),
              fixTag(col("g.value")).as("subject_id"),
              lit(null).cast("string").as("subject_name"))
      .filter(col("subject_id").isNotNull)
      .distinct()
    val about = books.select(col("key"), col("node_id").as("book_id"),
                             explode(col("about_refs")).as("uri"))
    val graphNodes = nodes.select(col("key").as("n_key"),
      col("node_id").as("n_id"), col("node_types").as("n_types"),
      col("names").as("n_names"))
    val joined = about.join(graphNodes,
      about("key") === col("n_key") && col("uri") === col("n_id"), "left")
    val patType = when(col("uri").rlike(DeweyRe), "DDC")
      .when(col("uri").rlike(FastRe), "FAST")
      .when(col("uri").rlike(LcshRe), "LCSH")
    val patId = when(col("uri").rlike(DeweyRe), regexp_extract(col("uri"), DeweyRe, 1))
      .when(col("uri").rlike(FastRe), regexp_extract(col("uri"), FastRe, 1))
      .when(col("uri").rlike(LcshRe), regexp_extract(col("uri"), LcshRe, 1))
    val typeFromNode =
      when(array_contains(col("n_types"), "schema:Topic"), "TOPIC")
        .when(array_contains(col("n_types"), "schema:Place"), "PLACE")
        .when(array_contains(col("n_types"), "schema:Person"), "PERSON")
        .when(array_contains(col("n_types"), "schema:Organization"), "ORG")
        .when(array_contains(col("n_types"), "schema:Event"), "EVENT")
        .when(array_contains(col("n_types"), "schema:CreativeWork"), "WORK")
        .when(array_contains(col("n_types"), "schema:Intangible"), "TAG")
    val nodeName = when(col("n_id").isNotNull, enName(col("n_names")))
    genreTags.unionByName(joined
      .select(about("key"), col("book_id"),
        coalesce(patType, typeFromNode).as("subject_type"),
        coalesce(patId, nodeName).as("subject_id"),
        when(patId.isNotNull, nodeName).as("subject_name"))
      .filter(col("subject_type").isNotNull && col("subject_id").isNotNull))
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
