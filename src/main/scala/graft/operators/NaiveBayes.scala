package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes domain/quality classifier — the TRAINABLE
  * counterpart of [[TextAnalysis.qualityClassifier]]'s fixed model:
  * train per-class token counts on the corpus itself (the fasttext-ish
  * filter-model shape real pipelines retrain per snapshot), classify
  * by argmax of Laplace-smoothed log-likelihood + prior.
  *
  * Engine-exact contract: probabilities quantize ONCE per MODEL ROW —
  * qlp = round(ln((c(class,word)+1)/(c(class)+V))·10⁶) as a long — so
  * scoring and the argmax run entirely on exact integers; the ≤1-ulp
  * ln divergence between engines can flip a model unit only within
  * ~10⁻¹⁰ of a rounding boundary (the [[UnigramLm]] guard-band
  * argument), and a flipped unit would have to land exactly on an
  * argmax tie to change a prediction.
  *
  * Scale shape: token counts are two map-side-combinable groupBys; the
  * DENSE model (every class × vocab pair, so unseen-pair smoothing is
  * a table row, not a special case) is classes × vocab — bounded by
  * the vocabulary, never the corpus; classification is ONE equi-join
  * of the per-doc token counts with the model on the word key (fan-out
  * × nClasses, combinable sum behind it) + a vocab-sized prior join —
  * no cross join against the document stream, no driver-side model.
  */
object NaiveBayes {

  /** One quantization scale across the trained-model family — the
    * guard-band argument and both oracles' 1e6 literals assume it. */
  val QScale: Long = UnigramLm.QScale

  private def qlp(x: Column): Column =
    round(log(x) * QScale, 0).cast("long")

  /** Dense model table: (cls, word, n, qlp) for EVERY class × vocab
    * word (n = raw count, possibly 0; qlp Laplace-smoothed), ordered
    * join-ready. The class×vocab cross join below is two
    * vocabulary-bounded aggregates — the one place a cross product is
    * the intended dense shape.
    */
  def train(docs: DataFrame, clsCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis
      .explodedWords(docs, textCol, clsCol).withColumnRenamed(clsCol, "cls")
      .localCheckpoint(eager = false) // feeds cw, ctot and the vocab
    val cw = toks.groupBy(col("cls"), col("word"))
      .agg(count(lit(1)).as("n"))
    val ctot = toks.groupBy(col("cls")).agg(count(lit(1)).as("ct"))
    val vocab = toks.select(col("word")).distinct()
    val v = vocab.agg(count(lit(1)).as("v"))
    val dense = ctot.crossJoin(vocab) // classes × vocab, both tiny
      .join(cw, Seq("cls", "word"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    PlanHints.withScalars(dense, v)
      .select(col("cls"), col("word"), col("n"),
        qlp((col("n") + 1).cast("double") / (col("ct") + col("v"))
          .cast("double")).as("qlp"))
  }

  /** Class priors: (cls, n_docs, prior_qlp). */
  def priors(docs: DataFrame, clsCol: String): DataFrame = {
    val perCls = docs.groupBy(col(clsCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val total = perCls.agg(sum(col("n_docs")).as("total"))
    PlanHints.withScalars(perCls, total)
      .select(col("cls"), col("n_docs"),
        qlp(col("n_docs").cast("double") / col("total").cast("double"))
          .as("prior_qlp"))
  }

  /** Classify every document: argmax over classes of
    * prior_qlp + Σ_tokens qlp(cls, token), ties to the
    * alphabetically-first class. Documents with no model-vocabulary
    * tokens (empty text, or a fully-unseen vocabulary when the model
    * trained elsewhere) keep their row with NULL predicted/score —
    * never silently dropped.
    *
    * @return (doc_id, actual, predicted, score, correct).
    */
  def classify(docs: DataFrame, idCol: String, clsCol: String,
               textCol: String, model: DataFrame,
               prior: DataFrame): DataFrame = {
    val tc = TextAnalysis.explodedWords(docs, textCol, idCol)
      .withColumnRenamed(idCol, "doc_id")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val scored = tc
      .join(model.hint("SHUFFLE_HASH"), Seq("word")) // fan-out × classes
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("cnt") * col("qlp")).as("like"))
      .join(prior, Seq("cls"))
      .withColumn("score", col("like") + col("prior_qlp"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls").asc)
    val top = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("predicted"), col("score"))
    docs.select(col(idCol).as("doc_id"), col(clsCol).as("actual"))
      .join(top, Seq("doc_id"), "left")
      .withColumn("correct", col("actual") === col("predicted"))
  }
}
