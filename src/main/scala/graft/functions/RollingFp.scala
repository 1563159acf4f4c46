package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Rabin–Karp rolling-hash document fingerprint:
  * `rolling_fp(tokens array<string>, k int) -> bigint`.
  *
  * The minimum over all k-token windows of the polynomial hash
  * `(t_1·B^(k-1) + … + t_k) mod M`, where `t_i` is the first 5 hex
  * digits of `md5(token_i)` (a 20-bit code), `B = 2^20`, and
  * `M = 1e9+7`. This is the winnowing-family content fingerprint
  * (Schleimer et al., SIGMOD'03): near-identical docs that share any
  * k-gram run are likely to share the minimum window hash, while the
  * md5 token coding keeps it engine-reproducible.
  *
  * Why a native expression: the composable rendering (q36's
  * `transform(sequence(...), i -> md5(concat(w[i], ...)))`) is a
  * higher-order function — CodegenFallback, one boxed lambda call per
  * window, and it re-hashes every window from scratch: O(n·k) digests
  * per doc. This expression participates in whole-stage codegen and
  * hashes each token ONCE, sliding the window in O(1) (subtract the
  * outgoing token's `t·B^k`, multiply by B, add the incoming token):
  * O(n) digests + O(n) arithmetic per doc, no per-element boxing.
  *
  * Null semantics (documented, VecDot's convention): a null token
  * array or null `k` yields null; fewer than `k` tokens yields null
  * (no window exists — matches the oracle's `CASE WHEN len >= k`);
  * a null ELEMENT yields null rather than a silent partial
  * fingerprint. `nullable` is overridden to true — the result can be
  * null even when both children are non-null.
  */
final case class RollingFp(tokens: Expression, k: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = k

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) if k.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp expects (array<string>, int), got " +
        s"(${tokens.dataType.simpleString}, ${k.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fp"

  override protected def nullSafeEval(arr: Any, kv: Any): Any =
    RollingFp.minWindowHash(arr.asInstanceOf[ArrayData],
      kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, kv) =>
      s"""java.lang.Long ${ev.value}$$r =
         |  graft.functions.RollingFp.minWindowHash($arr, $kv);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.longValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, k = newRight)
}

object RollingFp {
  /** Polynomial base: one bit more than the 20-bit token code. */
  val B: Long = 1L << 20
  /** Modulus: largest common 31-bit prime — keeps every intermediate
    * product (≤ 2^30 · 2^20) far inside a 64-bit long. */
  val M: Long = 1000000007L

  /** 20-bit token code: first 5 hex digits of md5, base-16 parsed —
    * the same md5-prefix coding the oracle can compute exactly. */
  def tokenCode(bytes: Array[Byte]): Long = {
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(bytes)
    java.lang.Long.parseLong(hex.substring(0, 5), 16)
  }

  /** Static kernel shared by the interpreted and generated paths:
    * min over all k-windows of the rolling polynomial hash. Boxed
    * return carries the null cases (no window / null element). */
  def minWindowHash(arr: ArrayData, k: Int): java.lang.Long = {
    val n = arr.numElements()
    if (k <= 0 || n < k) return null
    // B^k mod M — the outgoing token's weight after k more multiplies
    var powk = 1L
    var p = 0
    while (p < k) { powk = (powk * B) % M; p += 1 }
    val buf = new Array[Long](k) // ring buffer of in-window token codes
    var h = 0L
    var min = java.lang.Long.MAX_VALUE
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val t = tokenCode(arr.getUTF8String(i).getBytes)
      h = (h * B + t) % M
      if (i >= k) {
        // slide: remove t_{i-k} (read the ring slot BEFORE overwrite)
        h = (h - (buf(i % k) * powk) % M + M) % M
      }
      buf(i % k) = t
      i += 1
      if (i >= k && h < min) min = h
    }
    java.lang.Long.valueOf(min)
  }
}
