package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native popcount-of-AND over two long-array bitmaps:
  * `mask_intersect(array<bigint>, array<bigint>) -> bigint` =
  * Σᵢ bit_count(a[i] & b[i]).
  *
  * This is THE verify kernel of the set-similarity family (q28/q29/
  * q58/q75/q160): every surviving candidate pair pays one call over
  * |vocab|/64 longs. The higher-order rendering
  * (`aggregate(zip_with(a, b, (x,y) -> bit_count(x&y)), 0, +)`) is
  * CodegenFallback — ~2 boxed lambda calls per long — which round 9
  * measured as the dominant per-candidate cost once the pair-dedup
  * shuffle was gone (q160 at sf0.1: 11.4 s interpreted vs 2.1 s with
  * this expression; the q28/q75/q160 family at sf1: 14.1/14.7/18.9 s
  * → 7.4/9.0/3.4 s). Same left-to-right fold as the HOF, bit-identical
  * results, participates in whole-stage codegen (the VecDot pattern).
  *
  * Null semantics match the HOF fold: null array → null, null element
  * → null, length mismatch → null (zip_with pads the short side with
  * nulls, which nulls the sum) — a malformed bitmap surfaces as null,
  * never as a silent partial count. */
final case class MaskIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mask_intersect expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null element nulls the result
  override def prettyName: String = "mask_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MaskIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Long ${ev.value}$$r = graft.functions.MaskIntersect.count($a, $b);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.longValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MaskIntersect {
  /** Static kernel shared by interpreted and generated paths. */
  def count(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Canonical-pair test of the prefix-join dedup (q160 fast path):
  * `no_common_bit_below(a, b, bucket, bit) -> boolean` is true iff the
  * bitmap AND of `a` and `b` has NO set bit strictly below position
  * (bucket, bit) — all buckets before `bucket` empty, and within
  * `bucket` nothing under `bit` ((bit−1) is the below-mask even for
  * the sign bit). With each side's prefix bitmask riding the candidate
  * join, this makes "is this row the pair's minimum-wid common prefix
  * token" row-local — the filter that replaces the pair-dedup shuffle.
  * The HOF rendering (zip_with + exists over a slice + element_at)
  * costs ~3 boxed calls per long per CANDIDATE row; this is one
  * primitive early-exit loop in whole-stage codegen.
  *
  * It also removes a LATENT ANSI overflow the HOF rendering carried:
  * its below-mask was `pbit − 1` as an in-plan Long subtraction,
  * which THROWS under ANSI when pbit is the sign bit (1L<<63) — a
  * token whose wid ≡ 63 (mod 64) that becomes a pair's minimum
  * common prefix token. The tested SFs never evaluated that conjunct
  * on such a row (the And short-circuits), so the gate stayed green
  * by luck; the kernel's Java `bit - 1L` wraps to exactly the
  * all-bits-below-the-sign-bit mask (MaskOpsSpec pins the s = 63
  * case). The round-9 ANSI-audit rule in action: arithmetic that can
  * overflow belongs in a kernel with defined wrap semantics, not in
  * plan expressions.
  *
  * Null semantics: null input → null; length mismatch, an accessed
  * null element, or an out-of-range bucket → null (defensive — by
  * construction `bucket` indexes the shared layout). */
final case class NoCommonBitBelow(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) &&
      third.dataType == IntegerType && fourth.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "no_common_bit_below expects (array<bigint>, array<bigint>, " +
        s"int, bigint), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}, " +
        s"${fourth.dataType.simpleString})")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "no_common_bit_below"

  override protected def nullSafeEval(a: Any, b: Any, k: Any, bit: Any): Any =
    NoCommonBitBelow.test(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], k.asInstanceOf[Int],
      bit.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k, bit) =>
      s"""java.lang.Boolean ${ev.value}$$r =
         |  graft.functions.NoCommonBitBelow.test($a, $b, $k, $bit);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.booleanValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object NoCommonBitBelow {
  /** Static kernel shared by interpreted and generated paths. */
  def test(a: ArrayData, b: ArrayData, bucket: Int,
      bit: Long): java.lang.Boolean = {
    val n = a.numElements()
    if (n != b.numElements() || bucket < 0 || bucket >= n) return null
    var i = 0
    while (i < bucket) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if ((a.getLong(i) & b.getLong(i)) != 0L)
        return java.lang.Boolean.FALSE
      i += 1
    }
    if (a.isNullAt(bucket) || b.isNullAt(bucket)) return null
    java.lang.Boolean.valueOf(
      (a.getLong(bucket) & b.getLong(bucket) & (bit - 1L)) == 0L)
  }
}

/** Canonical-triple id of the q121 pHash pair dedup:
  * `ph_canonical_triple(x) -> int` where x = phA XOR phB over
  * `chunks` six-bit chunks — the lexicographically smallest triple
  * (i < j < k) of UNTOUCHED chunks (six-bit groups of x that are
  * zero), encoded i·100 + j·10 + k to match the keyed combos. A
  * qualifying pair (hamming ≤ 7 over 10 chunks) has ≥ 3 untouched
  * chunks by pigeonhole, so the id is defined on every surviving row;
  * fewer than 3 zero chunks → null (the caller filters hamming
  * first).
  *
  * A kernel rather than plan arithmetic for the same reason as
  * [[NoCommonBitBelow]], plus one more: the chained
  * isolate-lowest-bit rendering (`zm & -zm` ladders through three
  * withColumns) gets INLINED by CollapseProject into an exponentially
  * duplicated expression tree — measured as a 5.6 s → 114 s stage
  * blowup at sf1 (generated code past JIT limits falls the whole
  * join stage back to interpreted). */
final case class PhCanonicalTriple(child: Expression, chunks: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && chunks > 0 && chunks <= 10)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ph_canonical_triple expects (bigint) and 1..10 chunks, got " +
        s"(${child.dataType.simpleString}), chunks=$chunks")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // <3 zero chunks → null
  override def prettyName: String = "ph_canonical_triple"

  override protected def nullSafeEval(x: Any): Any =
    PhCanonicalTriple.tripleId(x.asInstanceOf[Long], chunks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""java.lang.Integer ${ev.value}$$r =
         |  graft.functions.PhCanonicalTriple.tripleId($x, $chunks);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.intValue(); }""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PhCanonicalTriple {
  /** Static kernel shared by interpreted and generated paths. */
  def tripleId(x: Long, chunks: Int): java.lang.Integer = {
    var first = -1; var second = -1; var third = -1
    var b = 0
    while (b < chunks && third < 0) {
      if (((x >>> (6 * b)) & 63L) == 0L) {
        if (first < 0) first = b
        else if (second < 0) second = b
        else third = b
      }
      b += 1
    }
    if (third < 0) null
    else java.lang.Integer.valueOf(first * 100 + second * 10 + third)
  }
}
