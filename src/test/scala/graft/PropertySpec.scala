package graft

import graft.anomaly.SpikeAndDip
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based invariants of the pure kernels (SURVEY §5.3).
  * Plain ScalaCheck `Properties` (sbt's scalacheck framework). */
object SpikeAndDipProps extends Properties("SpikeAndDip") {

  private val finite = Gen.choose(-1e6, 1e6)
  private val histGen = Gen.chooseNum(SpikeAndDip.MinHistory, 120)
    .flatMap(n => Gen.listOfN(n, finite).map(_.toArray))
  private val p = SpikeAndDip.Params()

  property("flag is 0/1, score >= 0, flag implies score > 1") =
    forAll(histGen, finite) { (h: Array[Double], v: Double) =>
      val (flag, s) = SpikeAndDip.score(h, v, p)
      (flag == 0 || flag == 1) && s >= 0.0 && (flag == 0 || s > 1.0)
    }

  property("score is insensitive to history order") =
    forAll(histGen, finite, Gen.long) { (h: Array[Double], v: Double, seed: Long) =>
      val shuffled = new scala.util.Random(seed).shuffle(h.toSeq).toArray
      SpikeAndDip.score(h, v, p) == SpikeAndDip.score(shuffled, v, p)
    }

  property("flag is shift-equivariant") =
    forAll(histGen, finite, Gen.choose(-1e5, 1e5)) {
      (h: Array[Double], v: Double, c: Double) =>
        SpikeAndDip.score(h, v, p)._1 ==
          SpikeAndDip.score(h.map(_ + c), v + c, p)._1
    }

  property("below MinHistory never flags") =
    forAll(Gen.listOf(finite), finite) { (h: List[Double], v: Double) =>
      val short = h.take(SpikeAndDip.MinHistory - 1)
      SpikeAndDip.score(short.toArray, v, p)._1 == 0
    }

  property("spikes/dips modes partition spikesanddips flags") =
    forAll(histGen, finite) { (h: Array[Double], v: Double) =>
      val both = SpikeAndDip.score(h, v, p)._1
      val spike = SpikeAndDip.score(h, v, p.copy(mode = "spikes"))._1
      val dip = SpikeAndDip.score(h, v, p.copy(mode = "dips"))._1
      both == math.max(spike, dip) && spike + dip <= 1
    }

  property("inverseNormalCdf is monotone and symmetric") =
    forAll(Gen.choose(0.01, 0.99), Gen.choose(0.01, 0.99)) { (a: Double, b: Double) =>
      val mono = Prop(a >= b ||
        SpikeAndDip.inverseNormalCdf(a) < SpikeAndDip.inverseNormalCdf(b))
      val sym = Prop(math.abs(SpikeAndDip.inverseNormalCdf(a) +
        SpikeAndDip.inverseNormalCdf(1 - a)) < 1e-7)
      mono && sym
    }

  property("known quantiles: z(0.975) ~ 1.96, z(0.5) = 0") = Prop(
    math.abs(SpikeAndDip.inverseNormalCdf(0.975) - 1.959964) < 1e-4 &&
      math.abs(SpikeAndDip.inverseNormalCdf(0.5)) < 1e-9)
}

object MultimodalProps extends Properties("Multimodal") {
  property("FakeDecoder: 4 dims, length stat, min <= mean <= max") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { (bs: List[Byte]) =>
      val f = llmdata.Multimodal.FakeDecoder.decode(bs.toArray, "x")
      f.length == 4 &&
        (bs.isEmpty || (f(0) == bs.length.toFloat && f(2) <= f(1) && f(1) <= f(3)))
    }
}
