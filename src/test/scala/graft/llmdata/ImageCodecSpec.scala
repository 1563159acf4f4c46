package graft.llmdata

import graft.SparkSpec
import graft.llmdata.Multimodal._

/** The real-codec proof for the MediaDecoder seam (round-6 VERDICT
  * item 4): `ImageIoDecoder` (pure-JVM `javax.imageio`) decodes
  * checked-in PNG fixtures (`src/test/resources/graft/` — 16×16
  * grayscale, hand-built byte-exact) through the same kernels the
  * stubbed queries gate: the batched `extractFeatures` mapPartitions
  * surface (q105's shape), the byte-domain `resize` (q104's kernel),
  * and the `aHash` threshold rule (q121's kernel) over DECODED pixels.
  * Green here means a production image pipeline is a fixture swap, not
  * a code change. */
class ImageCodecSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("ImageIoDecoder decodes a real PNG to the 8x8 luminance grid") {
    val grid = ImageIoDecoder.decode(fixture("grad.png"), "image/png")
    assert(grid.length == 64)
    assert(grid.forall(v => v >= 0f && v <= 255f))
    // the gradient fixture is non-constant: the grid must see it
    assert(grid.distinct.length > 1)
    // deterministic: same bytes, same grid
    assert(ImageIoDecoder.decode(fixture("grad.png"), "image/png")
      .sameElements(grid))
  }

  test("the decoder refuses non-image types and undecodable payloads loudly") {
    intercept[IllegalArgumentException] {
      ImageIoDecoder.decode(fixture("grad.png"), "text/plain")
    }
    intercept[IllegalArgumentException] {
      ImageIoDecoder.decode("not a png".getBytes, "image/png")
    }
  }

  test("extractFeatures runs the REAL codec through the batched Dataset surface") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, "image/png", fixture("grad.png")),
      MediaRecord(2L, "image/png", fixture("checker.png"))).toDS()
    val feats = extractFeatures(recs, ImageIoDecoder)
      .collect().sortBy(_.docId)
    assert(feats.map(_.docId).toSeq == Seq(1L, 2L))
    // distributed decode must equal direct decode — the mapPartitions
    // path adds batching, not arithmetic
    assert(feats(0).feature.sameElements(
      ImageIoDecoder.decode(fixture("grad.png"), "image/png")))
    assert(feats(1).nBytes == fixture("checker.png").length)
  }

  test("aHash over decoded grids: near-dup PNGs land within q121's radius, distinct ones far outside") {
    def hashOf(name: String): Long =
      aHash(ImageIoDecoder.decode(fixture(name), "image/png"))
    val base = hashOf("grad.png")
    val tweak = hashOf("grad_tweak.png") // one pixel nudged
    val far = hashOf("checker.png")
    assert(java.lang.Long.bitCount(base ^ tweak) <= 7,
      "a one-pixel tweak must stay inside the near-dup radius")
    assert(java.lang.Long.bitCount(base ^ far) > 7,
      "a checkerboard is not a near-dup of a gradient")
  }

  test("q104's resize kernel accepts real PNG payloads (byte-domain contract)") {
    import spark.implicits._
    val recs = Seq(MediaRecord(1L, "image/png", fixture("grad.png"))).toDS()
    val out = resize(recs, 64).collect().head
    assert(out.payload.length == 64) // fixture is 138 bytes > target
    assert(out.docId == 1L && out.mediaType == "image/png")
  }
}
