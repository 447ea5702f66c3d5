package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.VectorSearch
import org.apache.spark.sql.DataFrame

/** Similarity-search queries over the `embeddings` table. The DuckDB
  * oracles recompute cosine with the same sequential double-precision
  * fold (explicit list_transform/list_sum, not the built-in
  * list_cosine_similarity, to pin the accumulation order), and both
  * sides rank on the 6-dp-rounded value with vec_id tie-breaks.
  */
object AnnQueries {

  private def queriesDf(env: Env) =
    env.embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))

  /** Exact brute-force cosine top-5 for every 50th vector. */
  def annBruteTopK(env: Env): DataFrame =
    VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** LSH-bucketed approximate top-5 (scale path; rows-only check —
    * the quality bound vs brute force is asserted in VectorSearchSpec,
    * not by the SQL oracle). */
  def annLshTopK(env: Env): DataFrame =
    VectorSearch.lshTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** IVF-probed approximate top-5 (rows-only; centroid means are
    * data-derived so the probe set is approximate by design —
    * quality/consistency asserted in VectorSearchSpec). */
  def annIvfTopK(env: Env): DataFrame =
    VectorSearch.ivfTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** Embedding near-dup: all pairs with cosine ≥ 0.45. */
  def annCosPairs(env: Env): DataFrame =
    VectorSearch.cosineThresholdPairs(env.embeddings, 0.45)
      .orderBy($"vec_a", $"vec_b")

  private val cosSql =
    """list_sum(list_transform(range(1, len(%s) + 1),
      |    i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))""".stripMargin

  private def cos(a: String, b: String): String = {
    val ab = cosSql.format(a, a, b)
    val aa = cosSql.format(a, a, a)
    val bb = cosSql.format(b, b, b)
    s"($ab / (sqrt($aa) * sqrt($bb)))"
  }

  val entries: Seq[Q] = Seq(
    Q.sql("ann_brute_topk", annBruteTopK,
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM scored)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
         |FROM ranked WHERE rn <= 5
         |ORDER BY qid, rank""".stripMargin),

    Q("ann_lsh_topk", annLshTopK, None),

    Q("ann_ivf_topk", annIvfTopK, None),

    Q.sql("ann_cos_pairs", annCosPairs,
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       round(${cos("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE round(${cos("a.embedding", "b.embedding")}, 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin),
  )
}
