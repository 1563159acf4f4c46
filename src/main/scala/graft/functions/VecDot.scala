package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product: `vec_dot(array<double>, array<double>) -> double`.
  *
  * The Catalyst higher-order rendering (`aggregate(zip_with(a, b, *),
  * 0.0, +)`) is CodegenFallback — every element is a boxed lambda
  * call — which makes vector math the hot cost of the similarity
  * queries (measured: the k×dim assignment HOF dominates q52). This
  * expression is the same left-to-right fold (bit-identical results)
  * as a primitive loop that participates in whole-stage codegen.
  *
  * Null semantics match the HOF fold exactly: a null array yields
  * null, a null ELEMENT in either folded position yields null
  * (zip_with's `null * y` → null propagates through the sum), and
  * length-mismatched arrays yield null (zip_with pads the shorter
  * side with nulls, which nulls the sum) — a malformed unequal-dim
  * embedding surfaces as null, never as a silent partial dot product.
  */
final case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  // a null ELEMENT nulls the result even when both array children are
  // non-null — the default (children-derived) nullability would let
  // consumers skip the null check and read garbage
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}$$r = graft.functions.VecDot.dot($a, $b);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Static kernel shared by interpreted and generated paths. Boxed
    * return carries the null cases (null element / length mismatch ⇒
    * result null, matching the HOF fold, whose zip_with null-pads the
    * shorter array); the fast path is still one primitive loop. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
