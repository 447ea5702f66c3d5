package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for corpus construction: keep a
  * fixed fraction of every stratum (e.g. (lang, source)), choosing
  * members by md5 hash order — engine-portable and reproducible (the
  * same trick as the W5 hash-order sample), with a per-stratum floor
  * so rare strata survive.
  *
  * Scale posture: one shuffle (hash partition by strata) + one window.
  * When exact per-stratum quotas aren't required, the shuffle-free
  * variant is a pure map-side filter — keep rows whose hash falls
  * under the fraction threshold (`md5 < f·2^128` in spirit): expected
  * fraction f per stratum with zero data movement. The windowed exact
  * form below is the verifiable one; prefer the threshold form at
  * 100 TB when approximate quotas suffice.
  */
object Sampling {

  /** Exact stratified sample: ceil(fraction · stratum size) rows per
    * stratum, hash order, floor of 1. Emits the input columns.
    * NULL strata values hash as a sentinel (concat_ws would silently
    * DROP them, colliding null-stratum rows with other strata and
    * diverging from SQL `||` NULL propagation); strata values must not
    * contain the `|` delimiter. */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String,
                 fraction: Double, salt: String = "graft-strat")
      : DataFrame =
    stratifiedByFraction(df, strata, idCol, lit(fraction), salt)

  /** Mixture reweighting: per-ROW fraction expression (typically a
    * `when` ladder over a domain/source column) so each stratum is
    * sampled at its own rate — the data-mixture step of corpus
    * construction (upweight curated domains, downsample crawl). Same
    * hash-order determinism and per-stratum floor of 1. */
  def stratifiedByFraction(df: DataFrame, strata: Seq[String], idCol: String,
                           fraction: Column, salt: String = "graft-strat")
      : DataFrame = {
    val parts: Seq[Column] = strata.map(col)
    val hashed: Seq[Column] = parts.map(c => coalesce(c.cast("string"), lit("␀")))
    val w = Window.partitionBy(parts: _*)
      .orderBy(md5(concat_ws("|", lit(salt) +: hashed :+ col(idCol): _*)))
    val wAll = Window.partitionBy(parts: _*)
    df.withColumn("rn", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(wAll))
      .filter(col("rn") <= greatest(ceil(fraction * col("n_stratum")), lit(1)))
      .drop("rn", "n_stratum")
  }
}
