package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.NaiveBayes
import org.apache.spark.sql.DataFrame

/** Naive-Bayes domain classifier over `documents` (class = `source`) —
  * see [[graft.operators.NaiveBayes]]. The oracle replays the count
  * tables, the quantized model, and the integer argmax in SQL.
  */
object NbQueries {

  def textNbTrain(env: Env): DataFrame =
    NaiveBayes.train(env.documents, "source", "text")
      .orderBy($"cls", $"word")

  def textNbClassify(env: Env): DataFrame = {
    val docs = env.documents
    NaiveBayes.classify(env.spread(docs), "doc_id", "source", "text",
        NaiveBayes.train(docs, "source", "text"),
        NaiveBayes.priors(docs, "source"))
      .orderBy($"doc_id")
  }

  private val modelCte: String =
    """toks AS (SELECT source AS cls, unnest(string_split(text, ' ')) AS word
      |         FROM documents),
      |tf AS (SELECT cls, word FROM toks WHERE word <> ''),
      |cw AS (SELECT cls, word, CAST(count(*) AS BIGINT) AS n
      |       FROM tf GROUP BY cls, word),
      |ctot AS (SELECT cls, CAST(count(*) AS BIGINT) AS ct
      |         FROM tf GROUP BY cls),
      |vocab AS (SELECT DISTINCT word FROM tf),
      |vn AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
      |model AS (
      |  SELECT c.cls, vo.word, coalesce(cw.n, 0) AS n,
      |         CAST(round(ln((coalesce(cw.n, 0) + 1.0) / (c.ct + vn.v))
      |                    * 1000000) AS BIGINT) AS qlp
      |  FROM ctot c CROSS JOIN vocab vo CROSS JOIN vn
      |  LEFT JOIN cw ON cw.cls = c.cls AND cw.word = vo.word)""".stripMargin

  /** Shared by the batch entry and the t10 streaming-serving entry
    * (per-doc results are batch-independent, so the streamed union
    * replays exactly this SQL). */
  private[queries] val nbClassifySql: String =
      s"""WITH $modelCte,
         |prior AS (
         |  SELECT source AS cls, CAST(count(*) AS BIGINT) AS nd
         |  FROM documents GROUP BY source),
         |ptot AS (SELECT CAST(sum(nd) AS BIGINT) AS total FROM prior),
         |priorq AS (
         |  SELECT cls, CAST(round(ln(CAST(nd AS DOUBLE) / total) * 1000000)
         |              AS BIGINT) AS prior_qlp
         |  FROM prior, ptot),
         |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |       FROM documents),
         |tc AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt
         |       FROM dt WHERE word <> '' GROUP BY doc_id, word),
         |scored AS (
         |  SELECT t.doc_id, m.cls,
         |         CAST(sum(t.cnt * m.qlp) AS BIGINT) + any_value(p.prior_qlp)
         |           AS score
         |  FROM tc t JOIN model m USING (word)
         |  JOIN priorq p ON p.cls = m.cls
         |  GROUP BY t.doc_id, m.cls),
         |top AS (
         |  SELECT doc_id, cls AS predicted, score,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY score DESC, cls ASC) AS rn
         |  FROM scored)
         |SELECT d.doc_id, d.source AS actual, t.predicted, t.score,
         |       d.source = t.predicted AS correct
         |FROM documents d
         |LEFT JOIN top t ON t.doc_id = d.doc_id AND t.rn = 1
         |ORDER BY d.doc_id""".stripMargin

  val entries: Seq[Q] = Seq(
    Q.sql("text_nb_train", textNbTrain,
      s"""WITH $modelCte
         |SELECT cls, word, n, qlp FROM model ORDER BY cls, word""".stripMargin),

    Q.sql("text_nb_classify", textNbClassify, nbClassifySql)
  )

}
