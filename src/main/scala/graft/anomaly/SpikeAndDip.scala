package graft.anomaly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spike-and-dip anomaly detection — the engine's one genuinely custom
  * operator (W1: reference `stream-analytics/iot-stream-analytics-query
  * .sql:32-44`, `AnomalyDetection_SpikeAndDip(value, 95, 85,
  * 'spikesanddips') OVER (LIMIT DURATION(second, 60))`).
  *
  * The Azure model is closed-source; we implement the *published
  * contract* — per event, score the current value against up to
  * `historySize` preceding events inside the trailing event-time window,
  * at `confidence`% in spike and/or dip direction, returning a record
  * `(isAnomaly: 0/1, score: double)` per input row — with a transparent
  * robust-statistics detector: median/MAD z-score, two-sided for
  * 'spikesanddips'. SURVEY.md §7.4 records this decision; tests pin OUR
  * detector, not Azure's bits.
  */
object SpikeAndDip {

  /** value, confidence (%), historySize (events), window (event-time ms),
    * mode ∈ spikes|dips|spikesanddips. Defaults = the reference's
    * parameters. */
  final case class Params(
      confidence: Double = 95.0,
      historySize: Int = 85,
      windowMillis: Long = 60000L,
      mode: String = "spikesanddips") {
    require(confidence > 50 && confidence < 100, s"confidence $confidence")
    require(Set("spikes", "dips", "spikesanddips")(mode), s"mode $mode")
    /** two-sided normal quantile for the confidence level. */
    def threshold: Double = inverseNormalCdf(0.5 + confidence / 200.0)
  }

  /** Minimum history before anything can be flagged. */
  val MinHistory = 12

  /** Acklam's rational approximation of the standard normal inverse CDF
    * (max relative error ~1.15e-9) — public-domain algorithm. */
  def inverseNormalCdf(p: Double): Double = {
    require(p > 0 && p < 1)
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
    }
  }

  /** Core scorer: current value vs its history (order-insensitive).
    * Returns (isAnomaly, score) where score is |robust z| / threshold —
    * ≥ 1.0 means beyond the confidence bound in a flagged direction. */
  def score(history: Array[Double], value: Double, p: Params): (Int, Double) = {
    if (history.length < MinHistory || value.isNaN) return (0, 0.0)
    val sorted = history.sorted
    val med = medianOfSorted(sorted)
    val absDev = history.map(v => math.abs(v - med)).sorted
    val mad = medianOfSorted(absDev)
    // 1.4826 ≈ 1/Φ⁻¹(3/4): MAD → σ under normality; fall back to stddev
    // (then to a tiny epsilon) when MAD degenerates on constant history.
    val scale = {
      val s = mad * 1.4826
      if (s > 0) s
      else {
        val mean = history.sum / history.length
        val sd = math.sqrt(
          history.map(v => (v - mean) * (v - mean)).sum / history.length)
        if (sd > 0) sd else 1e-12
      }
    }
    val z = (value - med) / scale
    val directed = p.mode match {
      case "spikes" => z
      case "dips" => -z
      case _ => math.abs(z)
    }
    val s = math.max(0.0, directed / p.threshold)
    (if (directed > p.threshold) 1 else 0, s)
  }

  private def medianOfSorted(s: Array[Double]): Double = {
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Batch/windowed form: adds `outCol` = struct(isAnomaly int, score
    * double) scoring `valueCol` per row against the trailing
    * `windowMillis` of preceding rows (capped to the most recent
    * `historySize`), ordered by `tsCol` within `partitionCols`.
    *
    * Scale: with `partitionCols` non-empty the window state is
    * distributed per key. Empty `partitionCols` reproduces the
    * reference's global single-model semantics (no PARTITION BY in the
    * ASA query — SURVEY §7.4) and is inherently single-partition; prefer
    * per-device keys at scale. The frame is ≤ historySize+ window rows,
    * so per-row cost is bounded.
    */
  def batch(df: DataFrame, tsCol: String, valueCol: String,
      partitionCols: Seq[String] = Nil, outCol: String = "anom",
      params: Params = Params()): DataFrame = {
    import org.apache.spark.sql.{GraftSqlBridge => ExpressionUtils}
    val usCol = unix_micros(col(tsCol))
    val w0 =
      if (partitionCols.nonEmpty) Window.partitionBy(partitionCols.map(col): _*)
      else Window.partitionBy()
    val w = w0.orderBy(usCol)
      .rangeBetween(-params.windowMillis * 1000L, -1L)
    // the frame is collected in orderBy (event-time) order, so the
    // native expression caps history by taking the array tail; the
    // scorer itself is the codegen'd SpikeScore Expression, not a UDF.
    val hist = collect_list(col(valueCol).cast("double")).over(w)
    df.withColumn(outCol,
      ExpressionUtils.column(graft.functions.SpikeScore(
        ExpressionUtils.expression(hist),
        ExpressionUtils.expression(col(valueCol).cast("double")),
        params)))
  }

  /** The three reference scores + combined flag over an enriched telemetry
    * frame (battery / barometer / AccelMagnitude → `Anomaly` 0/1), i.e.
    * the full TelemetryWithAnoms → Telemetry output of
    * iot-stream-analytics-query.sql:64-83. */
  def telemetryAnomalies(enriched: DataFrame,
      partitionCols: Seq[String] = Nil, params: Params = Params()): DataFrame = {
    val withScores =
      batch(
        batch(
          batch(enriched.withColumn("battery_d", col("battery").cast("double")),
            "enqueuedTime", "battery_d", partitionCols, "BatteryAnom", params),
          "enqueuedTime", "barometer", partitionCols, "BarometerAnom", params),
        "enqueuedTime", "AccelMagnitude", partitionCols, "AccelAnom", params)
    withScores
      .withColumn("Anomaly",
        graft.enrich.Enrich.anomalyFlag(
          col("BatteryAnom"), col("BarometerAnom"), col("AccelAnom")))
      .drop("battery_d", "BatteryAnom", "BarometerAnom", "AccelAnom")
  }
}
