package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native minhash signature + LSH band keys:
  * `minhash_bands(array<string>) -> array<string>` of exactly 10
  * entries — the 8 per-permutation min-md5 components (s0..s7) followed
  * by the 2 band keys (md5('0'||s0..s3), md5('1'||s4..s7)) — the q29 /
  * StreamingDedup signature contract in one codegen'd pass.
  *
  * Why a kernel (the MaskIntersect lesson, applied to the OTHER side
  * of the dedup family): the per-row rendering
  * `transform(ts, w -> md5(concat(w, '#i')))` × 8 permutations is a
  * higher-order function — CodegenFallback, one boxed lambda call per
  * (token, permutation) — and StreamStateBench measured it as 88% of
  * the streaming dedup twin's cost (projection-only 20.6 s of the
  * 23.5 s total at 200k docs). The kernel hashes each token once per
  * permutation in a tight loop on one reused MessageDigest and
  * compares raw 16-byte digests instead of 32-char hex strings —
  * valid because zero-padded lowercase hex is order-isomorphic to
  * unsigned byte order — then hex-encodes only the 8 winners.
  *
  * Exact-parity contract (MinhashBandsSpec pins it element-for-element
  * against the HOF rendering): s_i = min over non-null tokens w of
  * md5_hex(utf8(w) ++ "#i"); a duplicate token cannot change a min, so
  * callers may (but need not) array_distinct first. Null semantics
  * match the HOF pipeline: null array → null row; null tokens are
  * skipped (array_min ignores nulls); no non-null token → null s_i and
  * null band keys (concat propagates null).
  */
final case class MinhashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(ts: Any): Any =
    MinhashBands.compute(ts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, ts =>
      s"${ev.value} = graft.functions.MinhashBands.compute($ts);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinhashBands {
  val NPerm = 8
  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** a < b over 16-byte digests, unsigned — ≡ lexicographic order of
    * their zero-padded lowercase hex renderings. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static kernel shared by interpreted and generated paths. */
  def compute(ts: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](NPerm)
    val n = ts.numElements()
    var t = 0
    while (t < n) {
      if (!ts.isNullAt(t)) {
        val w = ts.getUTF8String(t).getBytes
        var i = 0
        while (i < NPerm) {
          md.reset()
          md.update(w)
          md.update('#'.toByte)
          md.update(('0' + i).toByte)
          val d = md.digest()
          if (mins(i) == null || less(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[AnyRef](NPerm + 2)
    var i = 0
    while (i < NPerm) {
      out(i) = if (mins(i) == null) null else hex(mins(i))
      i += 1
    }
    // band b = md5_hex('b' ++ hex(s_{4b}) ++ .. ++ hex(s_{4b+3})) —
    // null if any component is null (concat's null propagation)
    var b = 0
    while (b < 2) {
      var anyNull = false
      var j = 0
      while (j < 4) { if (mins(4 * b + j) == null) anyNull = true; j += 1 }
      if (!anyNull) {
        md.reset()
        md.update(('0' + b).toByte)
        j = 0
        while (j < 4) {
          md.update(out(4 * b + j).asInstanceOf[UTF8String].getBytes)
          j += 1
        }
        out(NPerm + b) = hex(md.digest())
      }
      b += 1
    }
    new GenericArrayData(out)
  }
}
