package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded edit distance:
  * `lev_bounded(a string, b string, k int) -> int`.
  *
  * Returns the exact Levenshtein distance when it is ≤ k, else the
  * sentinel k+1 — the verify primitive of blocked record linkage
  * (q144/q169): a matcher only ever asks "is the distance within my
  * threshold", so computing the exact value beyond it is wasted work.
  *
  * Why a native expression: the built-in `levenshtein` fills the full
  * O(m·n) DP matrix; this is Ukkonen's banded variant — only the
  * 2k+1-wide diagonal band can hold a value ≤ k, so the DP is
  * O(k·min(m,n)) with three early exits (length gap > k; a row whose
  * whole band exceeds k; the final cell). For short bounds over long
  * strings (the ER hot path) that is the difference between a
  * band of 7 cells per row and the whole row. Participates in
  * whole-stage codegen via a static-method call (RollingFp's
  * pattern); distance is over UTF-16 code units (the built-in's
  * granularity — identical on ASCII catalogs, documented for parity
  * with the DuckDB oracle which counts codepoints).
  *
  * Null semantics: any null input yields null. A negative k clamps
  * to 0 (the equality test).
  */
final case class BoundedLevenshtein(a: Expression, b: Expression,
    k: Expression) extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = k

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, k.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lev_bounded expects (string, string, int), got " +
          s"(${a.dataType.simpleString}, ${b.dataType.simpleString}, " +
          s"${k.dataType.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean =
    a.nullable || b.nullable || k.nullable
  override def prettyName: String = "lev_bounded"

  override protected def nullSafeEval(av: Any, bv: Any, kv: Any): Any =
    BoundedLevenshtein.dist(av.asInstanceOf[UTF8String],
      bv.asInstanceOf[UTF8String], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, kv) =>
      s"${ev.value} = graft.functions.BoundedLevenshtein.dist($av, $bv, $kv);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(a = newFirst, b = newSecond, k = newThird)
}

object BoundedLevenshtein {
  /** min(levenshtein(a, b), k+1) by banded DP — static so generated
    * code calls it directly (no boxing, no closure). */
  def dist(au: UTF8String, bu: UTF8String, k0: Int): Int = {
    val k = if (k0 < 0) 0 else k0
    val inf = k + 1
    val s = au.toString
    val t = bu.toString
    val m = s.length
    val n = t.length
    if (m == 0) return math.min(n, inf)
    if (n == 0) return math.min(m, inf)
    if (math.abs(m - n) > k) return inf
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      var rowMin = cur(0)
      var jj = lo
      while (jj <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = cur(jj - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (rowMin >= inf) return inf // whole band over the bound
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(n), inf)
  }
}
