package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal plumbing through the driver contract: binary payloads
  * are synthesized deterministically (fake GIMG headers), decoded by
  * the stub kernel, and checked against a constructive oracle (the
  * oracle recomputes dimensions/lengths/md5 from the same
  * construction — it never parses).
  */
object MultimodalQueries {

  def mmMediaDecode(env: Env): DataFrame = {
    val w = ($"p_partkey" % 640 + 1).cast("int")
    val h = ($"p_partkey" % 480 + 1).cast("int")
    val content = concat(lit("GIMG|"), w, lit("|"), h, lit("|"), $"p_name")
      .cast("binary")
    val media = env.part.select($"p_partkey".as("media_id"), content.as("content"))
    Multimodal.decodeImages(media).toDF()
      .select($"mediaId".as("media_id"), $"width", $"height",
              $"nBytes".as("n_bytes"))
      .join(media.select($"media_id", md5($"content").as("content_md5")),
            "media_id")
      .orderBy($"media_id")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("mm_media_decode", mmMediaDecode,
      """WITH m AS (
        |  SELECT p_partkey AS media_id,
        |    CAST(p_partkey % 640 + 1 AS INT) AS width,
        |    CAST(p_partkey % 480 + 1 AS INT) AS height,
        |    'GIMG|' || (p_partkey % 640 + 1) || '|' || (p_partkey % 480 + 1)
        |      || '|' || p_name AS s
        |  FROM part)
        |SELECT media_id, width, height,
        |  CAST(length(s) AS INT) AS n_bytes,
        |  md5(s) AS content_md5
        |FROM m
        |ORDER BY media_id""".stripMargin),
  )
}
