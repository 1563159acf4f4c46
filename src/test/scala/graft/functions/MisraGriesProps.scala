package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants of the Misra–Gries kernel: the sketch
  * guarantees must hold for EVERY stream and EVERY merge tree, which
  * is exactly what Spark's partial aggregation gets to choose. */
object MisraGriesProps extends Properties("MisraGries") {

  private val item = Gen.oneOf((0 until 12).map(i => s"t$i"))
  private val stream = Gen.listOf(item)
  private val smallK = Gen.choose(1, 4)
  private val chunk = Gen.choose(1, 9)

  private def truth(xs: List[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def run(xs: Seq[String], k: Int): Map[String, Long] = {
    val mg = new MisraGries(k)
    xs.foldLeft(mg.zero)(mg.reduce)
  }

  property("exact regime (k >= distinct): sketch equals true counts under any chunking") =
    forAll(stream, chunk) { (xs: List[String], c: Int) =>
      val mg = new MisraGries(12)
      val merged =
        if (xs.isEmpty) mg.zero
        else xs.grouped(c).map(run(_, 12)).reduce(mg.merge)
      merged == truth(xs)
    }

  property("lossy regime: never overestimates; undershoot bounded by n/(k+1)") =
    forAll(stream, smallK, chunk) { (xs: List[String], k: Int, c: Int) =>
      val mg = new MisraGries(k)
      val merged =
        if (xs.isEmpty) mg.zero
        else xs.grouped(c).map(run(_, k)).reduce(mg.merge)
      val t = truth(xs)
      val bound = xs.size.toLong / (k + 1)
      merged.forall { case (x, est) => est >= 1 && est <= t(x) } &&
        t.forall { case (x, n) =>
          n - merged.getOrElse(x, 0L) <= bound }
    }

  property("at most k counters survive any merge tree") =
    forAll(stream, smallK, chunk) { (xs: List[String], k: Int, c: Int) =>
      val mg = new MisraGries(k)
      val merged =
        if (xs.isEmpty) mg.zero
        else xs.grouped(c).map(run(_, k)).reduce(mg.merge)
      merged.size <= k
    }
}
