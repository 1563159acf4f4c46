package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDriftSpec extends SparkSpec {
  import StreamingDrift.{Obs, Snapshot}

  private val ref = Map("click" -> 400L, "view" -> 400L, "error" -> 200L)

  test("cross-batch accumulation equals the one-shot fold") {
    val sp = spark
    import sp.implicits._
    val rows = Seq.fill(40)(Obs("click")) ++ Seq.fill(40)(Obs("view")) ++
      Seq.fill(20)(Obs("error"))
    def run(batches: Seq[Seq[Obs]], name: String): Snapshot = {
      val input = MemoryStream[Obs](sp)
      val q = StreamingDrift.monitor(input.toDS(), ref)
        .writeStream.format("memory").queryName(name).start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        sp.table(name).as[Snapshot].collect().maxBy(_.n_seen)
      } finally q.stop()
    }
    val split = run(Seq(rows.take(30), rows.slice(30, 70), rows.drop(70)),
      "drift_split")
    val once = run(Seq(rows), "drift_once")
    assert(split == once,
      "the statistic must depend only on what arrived, not batching")
    // a perfectly on-mix stream: every cell deviation is < 1 unit of
    // floored micro-noise only
    assert(once.chi2_micro == 0L && once.n_seen == 100L)
  }

  test("drift raises chi-square and names the worst category") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[Obs](sp)
    val q = StreamingDrift.monitor(input.toDS(), ref)
      .writeStream.format("memory").queryName("drift_alarm").start()
    try {
      input.addData(Seq.fill(4)(Obs("click")) ++ Seq.fill(4)(Obs("view")) ++
        Seq.fill(2)(Obs("error")): _*)
      q.processAllAvailable()
      val balanced = sp.table("drift_alarm").as[Snapshot].collect()
        .maxBy(_.n_seen)
      input.addData(Seq.fill(90)(Obs("error")): _*)
      q.processAllAvailable()
      val skewed = sp.table("drift_alarm").as[Snapshot].collect()
        .maxBy(_.n_seen)
      assert(balanced.chi2_micro == 0L)
      assert(skewed.chi2_micro > balanced.chi2_micro)
      assert(skewed.worst_cat == "error",
        "the flooded category must carry the largest deviation")
      // off-reference categories are ignored, not folded
      input.addData(Obs("unknown-cat"))
      q.processAllAvailable()
      val after = sp.table("drift_alarm").as[Snapshot].collect()
        .maxBy(_.n_seen)
      assert(after.n_seen == skewed.n_seen)
    } finally q.stop()
  }

  test("reference mix must be a complete mille partition") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[Obs](sp)
    val e = intercept[IllegalArgumentException] {
      StreamingDrift.monitor(input.toDS(), Map("a" -> 500L))
    }
    assert(e.getMessage.contains("1000"))
  }
}
