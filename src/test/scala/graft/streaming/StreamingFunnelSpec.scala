package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingFunnelSpec extends SparkSpec {
  import StreamingFunnel.Advance

  private val sf = "/root/testdata/sf0.001"

  test("ordered replay reproduces batch q88's chains exactly") {
    val sp = spark
    // stream the whole fixture in one ordered batch (batch mode runs
    // each user group once, events sorted by (ts, id) inside)
    val got = StreamingFunnel.advanceEvents(graft.Tables.events(sp, sf))
      .groupBy("user_id")
      .agg(max("step").as("step"),
        max(when(col("step") === 1, col("us"))).as("u1"),
        max(when(col("step") === 2, col("us"))).as("u2"),
        max(when(col("step") === 3, col("us"))).as("u3"))
    val want = SparkEntry.queries("q88_funnel")(sp, sf)
      .select(col("user_id"), col("step"),
        unix_micros(col("t1")).as("u1"), unix_micros(col("t2")).as("u2"),
        unix_micros(col("t3")).as("u3"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streaming advancement must equal the batch funnel on ordered input")
    assert(want.count() > 0)
  }

  test("steps advance across micro-batches; non-advancing and replayed events emit nothing") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String, Long, Long)](sp)
    val q = StreamingFunnel.advance(
        input.toDF.toDF("user_id", "event_type", "us", "event_id")
          .as[StreamingFunnel.Ev])
      .writeStream.format("memory").queryName("fun_cross").start()
    try {
      input.addData((7L, "click", 100L, 1L)) // click before any view: no-op
      q.processAllAvailable()
      assert(sp.table("fun_cross").count() === 0)
      input.addData((7L, "view", 200L, 2L))
      q.processAllAvailable()
      input.addData((7L, "click", 300L, 3L), (7L, "purchase", 400L, 4L))
      q.processAllAvailable()
      val rows = sp.table("fun_cross").as[Advance].collect().sortBy(_.step)
      assert(rows.map(r => (r.step, r.us)).toSeq ===
        Seq((1, 200L), (2, 300L), (3, 400L)))
      // replay of the click: slot filled, nothing emitted
      input.addData((7L, "click", 300L, 3L))
      q.processAllAvailable()
      assert(sp.table("fun_cross").count() === 3)
      // a second purchase after completion: no-op
      input.addData((7L, "purchase", 500L, 5L))
      q.processAllAvailable()
      assert(sp.table("fun_cross").count() === 3)
    } finally q.stop()
  }
}
