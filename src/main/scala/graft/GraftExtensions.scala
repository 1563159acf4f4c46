package graft

import graft.anomaly.SpikeAndDip
import graft.functions.SpikeScore
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Session extensions: registers the engine's custom SQL surface.
  *
  * Usage: `spark.sql.extensions=graft.GraftExtensions` at session build
  * (GraftSession does this), or `GraftExtensions.register(spark)` on an
  * externally created session (Verify/Bench).
  *
  * SQL forms:
  *   spike_score(history, value)                        — reference params (95/85)
  *   spike_score(history, value, confidence, historySize, mode)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.spikeScoreFn)
    e.injectFunction(GraftExtensions.vecDotFn)
    e.injectFunction(GraftExtensions.rollingFpFn)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftExtensions {
  private def str(e: Expression): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"spike_score: literal argument expected, got $other")
  }
  private def num(e: Expression): Double = str(e).toDouble

  val spikeScoreFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("spike_score"),
    new ExpressionInfo(classOf[SpikeScore].getName, "spike_score"),
    (args: Seq[Expression]) => {
      // SQL numeric literals arrive as decimals — coerce like a
      // built-in would (ExpectsInputTypes is private[sql] in Spark 4).
      def hd(e: Expression) = Cast(e, ArrayType(DoubleType))
      def vd(e: Expression) = Cast(e, DoubleType)
      args match {
        case Seq(h, v) => SpikeScore(hd(h), vd(v))
        case Seq(h, v, conf, hist, mode) => SpikeScore(hd(h), vd(v),
          SpikeAndDip.Params(
            confidence = num(conf),
            historySize = num(hist).toInt,
            mode = str(mode)))
        case other => throw new IllegalArgumentException(
          s"spike_score expects 2 or 5 arguments, got ${other.length}")
      }
    },
  )

  val vecDotFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[graft.functions.VecDot].getName, "vec_dot"),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => graft.functions.VecDot(
        Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
      case other => throw new IllegalArgumentException(
        s"vec_dot expects 2 arguments, got ${other.length}")
    },
  )

  val rollingFpFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_fp"),
    new ExpressionInfo(classOf[graft.functions.RollingFp].getName, "rolling_fp"),
    (args: Seq[Expression]) => args match {
      case Seq(toks, k) => graft.functions.RollingFp(
        toks, Cast(k, org.apache.spark.sql.types.IntegerType))
      case other => throw new IllegalArgumentException(
        s"rolling_fp expects 2 arguments, got ${other.length}")
    },
  )

  /** Programmatic registration for sessions built without the
    * extensions config. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(spikeScoreFn, vecDotFn, rollingFpFn).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    registerAggregators(spark)
  }

  /** SQL-text forms of the sketch aggregators (§2.11 UDAF surface).
    * `spark.udf.register` takes a concrete Aggregator instance, so each
    * SQL name pins one parameterization (the registry queries' regimes);
    * the typed Scala API (`udaf(new MisraGries(k), …)`) parameterizes
    * freely. Idempotent (re-registration replaces). */
  def registerAggregators(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.functions.udaf
    // tune() runs per query invocation: skip the four encoder
    // derivations + udaf wrappers once this session has them
    if (spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("mg_sketch"))) return
    spark.udf.register("mg_sketch",
      udaf(new graft.functions.MisraGries(64), Encoders.STRING))
    spark.udf.register("quantile_sketch",
      udaf(new graft.functions.QuantileSketchAgg(1 << 16,
        Seq(0.1, 0.5, 0.9, 0.99)), Encoders.scalaDouble))
    spark.udf.register("topk5",
      udaf(new graft.functions.TopK(5),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)))
    spark.udf.register("bloom_build",
      udaf(new graft.functions.BloomAgg(1 << 17),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()))
  }
}
