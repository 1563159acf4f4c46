package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the Bloom bitset aggregator and its Catalyst probe —
  * q85's oracle checks the end-to-end join semantics; the sketch
  * invariants that MAKE that gate sound are pinned here. */
class BloomSpec extends SparkSpec {

  private val mBits = 1 << 10 // deliberately tiny: collisions happen
  private val k = 3

  private def buildBits(keys: Seq[String]): Array[Long] = {
    import spark.implicits._
    val agg = udaf(new BloomAgg(mBits),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
    keys.toDF("fp")
      .select(Bloom.positions(col("fp"), mBits, k).as("pos"))
      .agg(agg(col("pos")).as("bits"))
      .collect()(0).getSeq[Long](0).toArray
  }

  private def probe(bits: Array[Long], keys: Seq[String]): Seq[Boolean] = {
    import spark.implicits._
    keys.toDF("fp")
      .withColumn("bits", typedlit(bits.toSeq))
      .select(Bloom.mightContain(col("bits"), col("fp"), mBits, k).as("hit"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("no false negatives: every inserted key probes positive, even in a saturated filter") {
    val inserted = (1 to 400).map(i => s"key-$i") // 400·3 probes on 1024 bits
    val bits = buildBits(inserted)
    assert(probe(bits, inserted).forall(identity))
  }

  test("definite-miss gate: an empty filter rejects everything; a populated one rejects most absent keys") {
    val empty = buildBits(Seq.empty)
    assert(probe(empty, (1 to 50).map(i => s"absent-$i")).forall(!_))
    val bits = buildBits((1 to 20).map(i => s"key-$i")) // sparse: 60/1024 bits
    val fpHits = probe(bits, (1 to 200).map(i => s"absent-$i")).count(identity)
    // expected fp rate ≈ (60/1024)^3 ≈ 2e-4 → allow a generous margin
    assert(fpHits <= 5, s"false-positive rate implausibly high: $fpHits/200")
  }

  test("merge is the OR-monoid: split-and-merge equals whole-build (partial aggregation safe)") {
    val agg = new BloomAgg(mBits)
    val keys = (1 to 100).map(i => s"key-$i")
    val whole = buildBits(keys)
    for (cut <- Seq(1, 13, 50, 99)) {
      val (l, r) = keys.splitAt(cut)
      val merged = agg.merge(buildBits(l), buildBits(r))
      assert(merged.toSeq === whole.toSeq, s"merge at $cut diverged")
    }
  }

  test("build and probe share position derivation: a probe-side reimplementation cannot drift") {
    // the positions array the aggregator consumed, recomputed via the
    // same public Column, must address exactly the set bits of a
    // single-key filter
    import spark.implicits._
    val bits = buildBits(Seq("solo"))
    val pos = Seq("solo").toDF("fp")
      .select(Bloom.positions(col("fp"), mBits, k).as("pos"))
      .collect()(0).getSeq[Int](0)
    val setBits = bits.zipWithIndex.flatMap { case (w, wi) =>
      (0 until 64).collect { case b if (w & (1L << b)) != 0L => wi * 64 + b }
    }
    assert(setBits.toSet === pos.toSet)
  }
}
