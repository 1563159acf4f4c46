package graft.functions

import graft.anomaly.SpikeAndDip
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the spike-and-dip scorer (W1):
  *
  *   `spike_score(history array<double>, value double) -> struct<isAnomaly:int, score:double>`
  *
  * `history` is the trailing-window frame in event-time order (e.g.
  * `collect_list(v) OVER (ORDER BY ts RANGE BETWEEN ...)`); the
  * most-recent `historySize` entries are scored (the array tail, since
  * frames are emitted in orderBy order). A native expression rather
  * than a Scala UDF so the call participates in whole-stage codegen:
  * `doGenCode` emits a direct static call — no row-level encoder
  * round-trip, no closure dispatch — and nulls short-circuit in
  * generated code.
  *
  * Registered as a SQL function by [[graft.GraftExtensions]]
  * (`SparkSessionExtensions.injectFunction`) and programmatically by
  * `GraftSession.tune`, so `spark.sql("... spike_score(h, v) ...")`
  * works the same as the Column API.
  */
final case class SpikeScore(
    history: Expression,
    value: Expression,
    params: SpikeAndDip.Params = SpikeAndDip.Params())
    extends Expression {

  override def children: Seq[Expression] = Seq(history, value)
  override def checkInputDataTypes(): TypeCheckResult =
    if ((history.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) && value.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"spike_score expects (array<double>, double), got " +
        s"(${history.dataType.simpleString}, ${value.dataType.simpleString})")
  override def dataType: DataType = StructType(Seq(
    StructField("isAnomaly", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false)))
  // a null value scores as not-anomalous (0, 0.0), never null — the
  // reference's CASE treats absent signals as quiet, and consumers
  // filter on isAnomaly = 0 without null traps
  override def nullable: Boolean = false
  override def prettyName: String = "spike_score"

  override def eval(input: InternalRow): Any = {
    val h = history.eval(input)
    val v = value.eval(input)
    if (v == null) SpikeScore.ZeroRow()
    else SpikeScore.score(
      if (h == null) SpikeScore.EmptyArray() else h.asInstanceOf[ArrayData],
      v.asInstanceOf[Double], params)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hGen = history.genCode(ctx)
    val vGen = value.genCode(ctx)
    val paramsRef = ctx.addReferenceObj("spikeParams", params,
      classOf[SpikeAndDip.Params].getName)
    val rowType = CodeGenerator.javaType(dataType)
    ev.copy(
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code =
        code"""
        |${hGen.code}
        |${vGen.code}
        |$rowType ${ev.value};
        |if (${vGen.isNull}) {
        |  ${ev.value} = graft.functions.SpikeScore.ZeroRow();
        |} else {
        |  ${ev.value} = graft.functions.SpikeScore.score(
        |    ${hGen.isNull} ? graft.functions.SpikeScore.EmptyArray()
        |                   : ${hGen.value},
        |    ${vGen.value}, $paramsRef);
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(history = newChildren(0), value = newChildren(1))
}

object SpikeScore {
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Double])
  /** Java-friendly accessor for generated code. */
  def EmptyArray(): ArrayData = Empty
  /** (0, 0.0) — the not-anomalous result for null inputs. */
  def ZeroRow(): InternalRow = InternalRow(0, 0.0)

  /** Static scoring kernel invoked from both interpreted and generated
    * paths. The frame array arrives in event-time order; only the tail
    * `historySize` entries (the most recent) are consulted. */
  def score(h: ArrayData, v: Double, p: SpikeAndDip.Params): InternalRow = {
    val all = h.toDoubleArray()
    val capped =
      if (all.length <= p.historySize) all
      else java.util.Arrays.copyOfRange(
        all, all.length - p.historySize, all.length)
    val (flag, s) = SpikeAndDip.score(capped, v, p)
    InternalRow(flag, s)
  }
}
