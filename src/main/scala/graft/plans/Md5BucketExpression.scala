package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hashed-feature bucket assignment of the quality-classifier
  * family as ONE native codegen'd expression:
  * `md5_bucket(salt, tok, buckets)` ≡
  * `pmod(conv(substring(md5(concat(salt, tok)), 1, 13), 16, 10), buckets)`
  * — the top 52 bits of the MD5 digest of the concatenated UTF-8
  * bytes, mod the bucket count — but computed straight from the digest
  * bytes: no 32-char hex string materialized per token, no base-16
  * re-parse, no intermediate concat buffer beyond the digest update.
  * This expression runs once per TOKEN in the classifier inference and
  * trainer paths, so the per-call allocation cut is the hot-path win;
  * bit-equality with the builtin chain is pinned by Md5BucketSpec and,
  * end-to-end, by every `text_quality_*` oracle (DuckDB replays the
  * hex-substring form and the hashes still match).
  *
  * `buckets` is a plan-time constant (a case-class field, not a child
  * expression) — it folds into the generated call site.
  */
case class Md5Bucket(left: Expression, right: Expression, buckets: Int)
    extends BinaryExpression {
  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_bucket expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_bucket"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Md5Bucket.compute(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.plans.Md5Bucket.compute($l, $r, $buckets)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Bucket =
    copy(left = newLeft, right = newRight)
}

object Md5Bucket {
  // MessageDigest is stateful — one instance per task thread
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static kernel the generated code calls directly: top 52 digest
    * bits (== the first 13 hex chars parsed base 16 — nonneg, so plain
    * `%` equals pmod) mod the bucket count. */
  def compute(salt: UTF8String, tok: UTF8String, buckets: Int): Int = {
    val d = md.get()
    d.reset()
    d.update(salt.getBytes)
    d.update(tok.getBytes)
    val b = d.digest()
    val h52 = ((b(0) & 0xffL) << 44) | ((b(1) & 0xffL) << 36) |
      ((b(2) & 0xffL) << 28) | ((b(3) & 0xffL) << 20) |
      ((b(4) & 0xffL) << 12) | ((b(5) & 0xffL) << 4) |
      ((b(6) & 0xf0L) >>> 4)
    (h52 % buckets).toInt
  }
}
