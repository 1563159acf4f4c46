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

  /** Reusable DP rows — the expression sits on all-pairs verify hot
    * paths (q144/q169 blocked linkage), where a per-invocation pair of
    * Int arrays is pure garbage; one thread-local pair serves every
    * call on that thread (Spark task threads are long-lived). */
  private final class Rows {
    var prev: Array[Int] = new Array[Int](64)
    var cur: Array[Int] = new Array[Int](64)
    def ensure(n: Int): Unit = if (prev.length < n) {
      val sz = java.lang.Integer.highestOneBit(n - 1) << 1
      prev = new Array[Int](sz)
      cur = new Array[Int](sz)
    }
  }
  private val tlRows: ThreadLocal[Rows] =
    ThreadLocal.withInitial(() => new Rows)

  /** min(levenshtein(a, b), k+1) by banded DP — static so generated
    * code calls it directly (no boxing, no closure).
    *
    * Allocation discipline (round-7 advice): the byte-length gap is
    * checked BEFORE any materialization — a UTF-16 length m of a
    * UTF-8 string of b bytes satisfies ⌈b/3⌉ ≤ m ≤ b (1–3-byte
    * sequences decode to one unit; 4-byte to two units for four
    * bytes), so a large enough byte gap proves |m−n| > k with zero
    * work. Full-ASCII inputs (the record-linkage catalog norm) then
    * run the DP directly over the UTF8String bytes — no String copy
    * at all; only genuinely non-ASCII pairs pay the toString. */
  def dist(au: UTF8String, bu: UTF8String, k0: Int): Int = {
    val k = if (k0 < 0) 0 else k0
    val inf = k + 1
    val ba = au.numBytes
    val bb = bu.numBytes
    if ((ba + 2) / 3 > bb + k || (bb + 2) / 3 > ba + k) return inf
    if (au.isFullAscii && bu.isFullAscii) distAscii(au, ba, bu, bb, k)
    else distChars(au.toString, bu.toString, k)
  }

  /** ASCII fast path: bytes ARE the UTF-16 code units. */
  private def distAscii(a: UTF8String, m: Int, b: UTF8String, n: Int,
      k: Int): Int = {
    val inf = k + 1
    if (m == 0) return math.min(n, inf)
    if (n == 0) return math.min(m, inf)
    if (math.abs(m - n) > k) return inf
    val rows = tlRows.get()
    rows.ensure(n + 1)
    var prev = rows.prev
    var cur = rows.cur
    var j = 0
    while (j <= n) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, 0, n + 1, inf)
      cur(0) = if (i <= k) i else inf
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      var rowMin = cur(0)
      val ca = a.getByte(i - 1)
      var jj = lo
      while (jj <= hi) {
        val cost = if (ca == b.getByte(jj - 1)) 0 else 1
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

  /** General path over UTF-16 code units (the built-in's granularity). */
  private def distChars(s: String, t: String, k: Int): Int = {
    val inf = k + 1
    val m = s.length
    val n = t.length
    if (m == 0) return math.min(n, inf)
    if (n == 0) return math.min(m, inf)
    if (math.abs(m - n) > k) return inf
    val rows = tlRows.get()
    rows.ensure(n + 1)
    var prev = rows.prev
    var cur = rows.cur
    var j = 0
    while (j <= n) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= m) {
      java.util.Arrays.fill(cur, 0, n + 1, inf)
      cur(0) = if (i <= k) i else inf
      val lo = math.max(1, i - k)
      val hi = math.min(n, i + k)
      var rowMin = cur(0)
      val ca = s.charAt(i - 1)
      var jj = lo
      while (jj <= hi) {
        val cost = if (ca == t.charAt(jj - 1)) 0 else 1
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
