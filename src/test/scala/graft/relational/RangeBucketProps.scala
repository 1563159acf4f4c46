package graft.relational

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for q95's bucket-cover argument: with bucket width =
  * window width, replicating the left endpoint to its start and end
  * buckets covers EVERY qualifying pair exactly once (each pair meets
  * in the right row's own bucket) — checked against brute force on
  * arbitrary timestamp sets. Engine-free: the property is integer
  * math, the query is the DataFrame rendering of it. */
object RangeBucketProps extends Properties("RangeBucket") {

  private val W = 60L // window = bucket width (scaled-down µs)
  private val ts = Gen.listOf(Gen.chooseNum(0L, 10000L)).map(_.distinct)

  property("bucketed join ≡ brute-force theta join, each pair exactly once") =
    forAll(ts, ts) { (as: List[Long], bs: List[Long]) =>
      val brute = for {
        a <- as; b <- bs if b >= a && b < a + W
      } yield (a, b)
      // the q95 plan: a replicated to {a/W, (a+W)/W}, b keyed by b/W,
      // equi-join on the bucket, then the exact range verify
      val bucketed = for {
        a <- as
        bucket <- Set(a / W, (a + W) / W).toList
        b <- bs if b / W == bucket && b >= a && b < a + W
      } yield (a, b)
      bucketed.sorted == brute.sorted &&
        bucketed.size == bucketed.distinct.size
    }

  property("the end bucket is load-bearing: start-only misses straddling pairs") =
    forAll(Gen.chooseNum(0L, 10000L)) { a =>
      // b in the window but past a's bucket boundary exists whenever
      // the window straddles — e.g. the first instant of the next
      // bucket (skip the aligned case where a IS a boundary and the
      // window exactly fills its own bucket)
      val b = (a / W + 1) * W
      b >= a + W || (b >= a && b < a + W && b / W != a / W)
    }
}
