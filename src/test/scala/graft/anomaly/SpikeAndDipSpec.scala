package graft.anomaly

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SpikeAndDipSpec extends SparkSpec {
  import SpikeAndDip._

  private val p = Params() // reference params: 95% / 85 events / 60 s

  test("flat history + in-range value is not anomalous") {
    val hist = Array.fill(30)(10.0) ++ Array(10.1, 9.9, 10.05)
    assert(score(hist, 10.0, p)._1 == 0)
  }

  test("large spike over stable history is flagged") {
    val hist = (1 to 40).map(i => 10.0 + 0.1 * (i % 5)).toArray
    val (flag, sc) = score(hist, 100.0, p)
    assert(flag == 1)
    assert(sc > 1.0)
  }

  test("constant history degenerates gracefully (MAD→stddev→epsilon)") {
    val hist = Array.fill(20)(5.0)
    assert(score(hist, 5.0, p)._1 == 0) // same value: no anomaly
    assert(score(hist, 6.0, p)._1 == 1) // any deviation from constant: flagged
  }

  test("insufficient history never flags") {
    assert(score(Array.fill(MinHistory - 1)(1.0), 100.0, p)._1 == 0)
  }

  test("mode directions: dips flags only drops") {
    val hist = (1 to 40).map(i => 50.0 + (i % 7)).toArray
    val dips = Params(mode = "dips")
    assert(score(hist, 0.0, dips)._1 == 1)
    assert(score(hist, 500.0, dips)._1 == 0)
    val spikes = Params(mode = "spikes")
    assert(score(hist, 500.0, spikes)._1 == 1)
    assert(score(hist, 0.0, spikes)._1 == 0)
  }

  test("higher confidence flags less") {
    val hist = (1 to 60).map(i => (i % 11).toDouble).toArray
    val v = 14.0
    val lo = score(hist, v, Params(confidence = 80))
    val hi = score(hist, v, Params(confidence = 99.9))
    assert(lo._2 >= hi._2) // score shrinks as the threshold grows
  }

  test("batch wrapper: row count preserved, injected spike flagged, warm-up quiet") {
    import spark.implicits._
    val base = (0 until 60).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        if (i == 50) 1000.0 else 10.0 + (i % 3) * 0.1)
    }
    val df = base.toDF("ts", "v")
    val out = SpikeAndDip.batch(df, "ts", "v", partitionCols = Nil)
    assert(out.count() == 60)
    val rows = out.select(col("ts"), col("anom.isAnomaly")).collect()
      .map(r => (r.getTimestamp(0).toString, r.getInt(1))).toMap
    assert(rows("2024-01-01 00:00:50.0") == 1)
    // warm-up (< MinHistory preceding events) stays quiet
    assert(rows("2024-01-01 00:00:05.0") == 0)
    // flat tail unaffected by being after the spike (robust statistics)
    assert(rows("2024-01-01 00:00:55.0") == 0)
  }

  test("batch wrapper caps history at historySize most-recent events") {
    import spark.implicits._
    // 200 events 100 ms apart → all inside the 60 s window; only the
    // most recent 85 may influence the score.
    val df = (0 until 200).map { i =>
      (new java.sql.Timestamp(1700000000000L + i * 100L),
        if (i < 100) 0.0 else 50.0) // regime change at i=100
    }.toDF("ts", "v")
    val out = SpikeAndDip.batch(df, "ts", "v", partitionCols = Nil)
      .select(col("v"), col("anom.isAnomaly").as("f")).collect()
    // by i=190 the capped history is entirely post-change (values 50.0),
    // so 50.0 must no longer be anomalous
    assert(out.last.getInt(1) == 0)
  }
}
