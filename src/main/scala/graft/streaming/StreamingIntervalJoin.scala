package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q40's click→purchase attribution as a genuine stream-stream interval
  * join — the last q40 execution surface: batch rendering (q40), and now
  * the unbounded one.
  *
  * Spark-first deliberately: `StreamingSymmetricHashJoinExec` IS the
  * engine's operator for this shape, so there is no custom state code
  * here. The library's whole job is the join condition's GEOMETRY —
  * time bounds in both directions plus watermarks on both sides are
  * what let the engine prove each side's state FINITE (clicks older
  * than watermark − horizon can never match a future purchase and are
  * evicted; purchases evict at the watermark). Omit either bound and
  * state grows without limit — the classic unbounded-join production
  * incident.
  *
  * Semantics match q40 exactly: same-user purchases in
  * `[click_ts, click_ts + horizon)`. In batch mode the watermarks are
  * no-ops and this IS q40's join (spec-pinned), one definition on both
  * execution surfaces — the unified-API discipline every op here
  * follows.
  */
object StreamingIntervalJoin {

  /** `clicks`/`purchases`: (event_id, user_id, ts) frames (streaming or
    * batch). Output: (click_id, purchase_id) per qualifying pair. */
  def attribute(clicks: DataFrame, purchases: DataFrame,
      horizonHours: Int = 24,
      lateness: String = "0 seconds"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val p = purchases
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    c.join(p,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("click_ts") &&
          col("p_ts") < col("click_ts") +
            expr(s"interval $horizonHours hours"))
      .select("click_id", "purchase_id")
  }
}
