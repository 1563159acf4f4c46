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
