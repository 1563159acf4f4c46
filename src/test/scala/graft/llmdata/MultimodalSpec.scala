package graft.llmdata

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("FakeDecoder is deterministic byte statistics") {
    val f = FakeDecoder.decode(Array[Byte](1, 2, 3), "text/plain")
    assert(f.toSeq == Seq(3f, 2f, 1f, 3f)) // n, mean, min, max
    assert(FakeDecoder.decode(Array.empty, "x").toSeq == Seq(0f, 0f, 0f, 0f))
    // unsigned byte handling: 0xFF is 255, not -1
    assert(FakeDecoder.decode(Array[Byte](-1), "x").toSeq == Seq(1f, 255f, 255f, 255f))
  }

  test("resize: bounded payloads, row count preserved, small payloads untouched") {
    val recs = mediaRecords(spark, "/root/testdata/sf0.001")
    val n = recs.count()
    val resized = resize(recs, 32)
    assert(resized.count() == n)
    val sizes = resized.collect().map(_.payload.length)
    assert(sizes.forall(_ <= 32))
    // deterministic: same input → same bytes
    val again = resize(recs, 32).collect().map(_.payload.toSeq).toSet
    assert(resized.collect().map(_.payload.toSeq).toSet == again)
  }

  test("sampleFrames: nFrames rows per doc, frames reassemble the payload") {
    import spark.implicits._
    val recs = mediaRecords(spark, "/root/testdata/sf0.001").limit(20)
    val frames = sampleFrames(recs, 4).collect()
    assert(frames.groupBy(_.docId).forall(_._2.length == 4))
    val byDoc = frames.groupBy(_.docId)
    val originals = recs.collect().map(r => r.docId -> r.payload.toSeq).toMap
    byDoc.foreach { case (id, fs) =>
      val reassembled = fs.sortBy(_.frameIdx).flatMap(_.payload).toSeq
      assert(reassembled == originals(id)) // contiguous, lossless split
    }
  }

  test("extractFeatures: row-preserving batched decode over binary payloads") {
    val recs = mediaRecords(spark, "/root/testdata/sf0.001")
    val n = recs.count()
    assert(n > 0)
    val feats = extractFeatures(recs, FakeDecoder)
    assert(feats.count() == n)
    val f = feats.head()
    assert(f.mediaType == "text/plain")
    assert(f.nBytes > 0)
    assert(f.feature.length == 4)
    assert(f.feature(0) == f.nBytes.toFloat) // stub contract: dim0 = length
  }
}
