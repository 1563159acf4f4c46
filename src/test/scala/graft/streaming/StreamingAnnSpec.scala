package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAnnSpec extends SparkSpec {
  import StreamingAnn.Neighbor

  private val sf = "/root/testdata/sf0.001"

  /** Near-axis vector along dim `d` with a +0.01 floor on every dim —
    * all-positive, so every fixture lands in the SAME sign bucket
    * (255) and only the cosine decides emission. */
  private def axis(d: Int, s: Float = 1f): Seq[Float] =
    (0 until 8).map(i => if (i == d) s else 0.01f)

  private def mix(a: Int, b: Int, wa: Float, wb: Float): Seq[Float] =
    (0 until 8).map(i =>
      if (i == a) wa else if (i == b) wb else 0.01f)

  test("batch mode reproduces the exact in-bucket pair join (q83's relation)") {
    val sp = spark
    import sp.implicits._
    val vecs = graft.Tables.embeddings(sp, sf)
    val got = StreamingAnn.neighborsForVecs(vecs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // reference: plain same-bucket cosine join on the same definition
    val b = StreamingAnn.bucketed(vecs)
    val l = b.toDF("a_id", "bucket", "va")
    val r = b.toDF("b_id", "bucket_b", "vb")
    val want = l.join(r,
        col("bucket") === col("bucket_b") && col("a_id") < col("b_id"))
      .withColumn("c", aggregate(
        zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (a, x) => a + x))
      .filter(col("c") > 0.42)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture must exercise at least one pair")
  }

  test("neighbors are detected across micro-batches; replay re-emits nothing") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, Seq[Float])](sp)
    val q = StreamingAnn.neighborsForVecs(
        input.toDF.toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("ann_cross").start()
    try {
      input.addData((1L, axis(0)), (2L, axis(1)))
      q.processAllAvailable()
      assert(sp.table("ann_cross").count() === 0, "orthogonal axes differ in bucket or cosine")
      // batch 2: near-copy of vector 1 → cross-batch pair (1, 3)
      input.addData((3L, mix(0, 1, 1f, 0.1f)))
      q.processAllAvailable()
      val pairs = sp.table("ann_cross").as[Neighbor].collect()
      assert(pairs.map(p => (p.a_id, p.b_id)).toSet === Set((1L, 3L)))
      assert(pairs.head.cosine > 0.9)
      // at-least-once replay of vector 3: nothing new
      input.addData((3L, mix(0, 1, 1f, 0.1f)))
      q.processAllAvailable()
      assert(sp.table("ann_cross").count() === 1)
    } finally q.stop()
  }

  test("bucket state survives under the RocksDB state store (the corpus-scale provider)") {
    val sp = spark
    import sp.implicits._
    withRocksDBStateStore {
      val input = MemoryStream[(Long, Seq[Float])](sp)
      val q = StreamingAnn.neighborsForVecs(
          input.toDF.toDF("vec_id", "embedding"))
        .writeStream.format("memory").queryName("ann_rocks").start()
      try {
        input.addData((1L, axis(0)))
        q.processAllAvailable()
        input.addData((3L, mix(0, 1, 1f, 0.1f)))
        q.processAllAvailable()
        val pairs = sp.table("ann_rocks").as[Neighbor].collect()
        assert(pairs.map(p => (p.a_id, p.b_id)).toSet === Set((1L, 3L)),
          "cross-batch vector state must survive in RocksDB")
      } finally q.stop()
    }
  }

  test("maxPerBucket bounds state: overflow arrivals still match retained vectors, and their replay is remembered") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, Seq[Float])](sp)
    val q = StreamingAnn.neighborsForVecs(
        input.toDF.toDF("vec_id", "embedding"), maxPerBucket = 2)
      .writeStream.format("memory").queryName("ann_bound").start()
    try {
      // same bucket (all positive dim 0), high mutual cosine
      input.addData((1L, axis(0)), (2L, mix(0, 1, 1f, 0.05f)))
      q.processAllAvailable()
      val afterFill = sp.table("ann_bound").count()
      assert(afterFill === 1) // (1,2)
      // 3 overflows (bucket full) but must still match 1 and 2
      input.addData((3L, mix(0, 1, 1f, 0.02f)))
      q.processAllAvailable()
      val got = sp.table("ann_bound").as[Neighbor].collect()
        .map(p => (p.a_id, p.b_id)).toSet
      assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)))
      // 4 arrives: pairs only against the RETAINED 1 and 2, not 3
      input.addData((4L, mix(0, 1, 1f, 0.03f)))
      q.processAllAvailable()
      val got2 = sp.table("ann_bound").as[Neighbor].collect()
        .map(p => (p.a_id, p.b_id)).toSet
      assert(got2 === Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
      // overflowed 3 replayed: no double emission
      input.addData((3L, mix(0, 1, 1f, 0.02f)))
      q.processAllAvailable()
      assert(sp.table("ann_bound").count() === 5)
    } finally q.stop()
  }
}
