package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join (100 TB posture; SURVEY.md §7 flags
  * celebrity identifiers in the equivalency graph). AQE's skew-join
  * handles sort-merge skew automatically when partition sizes trip its
  * thresholds, but salting remains the explicit tool when one build key
  * dominates (e.g. one identifier with millions of equivalents):
  * the skewed (large) side gets a random salt in [0, factor); the
  * replicated (small) side is exploded across every salt value, and the
  * join runs on (key, salt) — splitting each hot key into `factor`
  * partitions.
  */
object SkewJoin {

  /** Inner equi-join of `large` and `small` on `key`, salted.
    * `small` is replicated `factor`× — keep it the dimension side.
    * Results are identical to `large.join(small, key)`; only the
    * partitioning changes.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    require(factor > 0)
    val salted = large.withColumn("_salt",
      (rand(11) * factor).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Hot-key split variant: only keys in `hotKeys` are salted (both
    * sides filtered + unioned), the long tail joins normally — avoids
    * replicating the small side for well-behaved keys. This is the
    * shape AQE produces adaptively; explicit form for when the hot set
    * is known ahead of planning.
    */
  def saltedJoinHotKeys(large: DataFrame, small: DataFrame, key: String,
                        hotKeys: Seq[Any], factor: Int = 8): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val normal = large.filter(!isHot).join(small.filter(!isHot), Seq(key))
    val salted = saltedJoin(large.filter(isHot), small.filter(isHot),
                            key, factor)
    normal.unionByName(salted)
  }
}
