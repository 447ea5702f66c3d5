package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6 — Overdrive bibliographic JSON (ref `overdrive.py:38-90`): the
  * reference looks each Overdrive id up through a credentialed
  * collection and parses the JSON body; the engine models the service
  * as a snapshot table (overdrive_id, json) and parses with a typed
  * `from_json` — one narrow pass.
  */
object OverdriveJson {

  val creatorSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("role", StringType)))

  val formatSchema: StructType = StructType(Seq(
    StructField("id", StringType)))

  val bookSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("subtitle", StringType),
    StructField("creators", ArrayType(creatorSchema)),
    StructField("languages", ArrayType(StructType(Seq(
      StructField("code", StringType))))),
    StructField("formats", ArrayType(formatSchema))))

  /** Parse a snapshot table into bibliographic rows: title, primary
    * creator (first Author role, else first creator), language code,
    * format count. */
  def parseBibliographic(snapshot: DataFrame, idCol: String,
                         jsonCol: String): DataFrame = {
    val b = col("b")
    val authors = filter(b.getField("creators"),
      c => c.getField("role") === "Author")
    snapshot
      .select(col(idCol).as("overdrive_id"),
        from_json(col(jsonCol), bookSchema).as("b"))
      .select(col("overdrive_id"),
        b.getField("title").as("title"),
        coalesce(
          get(authors, lit(0)).getField("name"),
          get(b.getField("creators"), lit(0)).getField("name")).as("author"),
        get(b.getField("languages"), lit(0)).getField("code").as("language"),
        coalesce(size(b.getField("formats")), lit(0)).as("n_formats"))
  }
}
