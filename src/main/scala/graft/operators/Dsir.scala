package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * score every raw document by how target-domain-like its hashed
  * n-gram distribution is, `log w(x) = Σ_g ln(p̂_target(b(g)) /
  * p̂_raw(b(g)))`, the weight the resampling step (a Gumbel-top-k or
  * threshold draw over `logw`, cf. [[Sampling]]) then consumes.
  *
  * Fidelity to the paper: features are hashed word unigrams AND
  * bigrams; probabilities are add-1-smoothed bucket frequencies. The
  * hash is the first two hex chars of md5 (256 buckets) — engine-
  * portable, so the whole pipeline is SQL-oracle-checkable.
  *
  * Scale shape: one explode pass over the corpus produces the gram
  * stream (checkpointed — it feeds two aggregates and the probe);
  * both count tables are ≤256 rows (map-side-combinable groupBy, then
  * BROADCAST to the probe join — no corpus-sized shuffle anywhere);
  * corpus totals attach via the codegen-safe
  * [[PlanHints.withScalars]]. The only corpus-sized shuffle is the
  * final per-doc fold's groupBy — unavoidable and key-uniform.
  *
  * Float determinism (the perplexity contract): the smoothed ratio is
  * two IEEE divisions of exactly-represented longs — bit-identical in
  * both engines at any scale (no long·long product that could
  * overflow at 100 TB) — and the only transcendental, `ln`, runs as
  * ONE position-ordered fold per doc, rounded once at 4 dp, keeping
  * the known ≤1-ulp libm/JVM divergence ~10⁻¹² relative — far inside
  * the rounding guard.
  */
object Dsir {

  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Per-document DSIR log-importance-weight.
    *
    * @param targetPred rows satisfying it form the target domain; all
    *                   rows form the raw pool (the paper's setup with
    *                   the target sample inside the pool).
    * @return (doc_id, is_target, n_grams, logw) — one row per doc.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        targetPred.as("is_target"), split(col(textCol), " ").as("s"))
      .localCheckpoint(eager = false) // feeds the gram stream + output join
    // positions: unigrams 1..n, then bigrams n+1..2n-1 — unique per
    // doc, so the ordered ln-fold below is deterministic.
    val uni = transform(sequence(lit(1), size($"s")),
      i => struct(i.as("pos"), element_at($"s", i).as("gram")))
    val bi = when(size($"s") >= 2,
        transform(sequence(lit(1), size($"s") - 1),
          j => struct((size($"s") + j).as("pos"),
            concat_ws(" ", element_at($"s", j),
              element_at($"s", j + 1)).as("gram"))))
      .otherwise(array().cast("array<struct<pos:int,gram:string>>"))
    val grams = base
      .select($"doc_id", $"is_target", explode(concat(uni, bi)).as("g"))
      .select($"doc_id", $"is_target", $"g.pos".as("pos"),
        substring(md5($"g.gram"), 1, 2).as("bucket"))
      .localCheckpoint(eager = false) // two aggs + the probe side
    val ct = grams.filter($"is_target")
      .groupBy($"bucket").agg(count(lit(1)).as("ct"))
    val cr = grams.groupBy($"bucket").agg(count(lit(1)).as("cr"))
    val totals = grams.agg(
      sum(when($"is_target", 1L).otherwise(0L)).as("tot_t"),
      count(lit(1)).as("tot_r"))
    val ratios = PlanHints.withScalars(
        grams.join(broadcast(cr), Seq("bucket"))
          .join(broadcast(ct), Seq("bucket"), "left"), totals)
      .select($"doc_id", $"pos",
        (((coalesce($"ct", lit(0L)) + 1).cast("double")
            / ($"tot_t" + 256).cast("double"))
          / (($"cr" + 1).cast("double")
            / ($"tot_r" + 256).cast("double"))).as("ratio"))
    val folded = ratios.groupBy($"doc_id")
      .agg(count(lit(1)).as("ng"),
        collect_list(struct($"pos", $"ratio")).as("rs"))
      .as[(Long, Long, Seq[(Int, Double)])]
      .map { case (id, ng, rs) =>
        var s = 0.0
        rs.sortBy(_._1).foreach { case (_, r) => s += math.log(r) }
        (id, ng, r4(s))
      }
      .toDF("doc_id", "ng", "logw")
    base.select($"doc_id", $"is_target")
      .join(folded, Seq("doc_id"))
      .select($"doc_id", $"is_target",
        $"ng".cast("int").as("n_grams"), $"logw")
  }
}
