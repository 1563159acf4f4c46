package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a Spark `Aggregator` — the
  * custom-AGGREGATE point on the engine's extensibility surface
  * (SURVEY §2.11), next to the native scalar expressions
  * (`SpikeScore`, `VecDot`, `RollingFp`) and the native physical
  * operator (`AsOfJoinExec`).
  *
  * Frequent-items estimation is the corpus-profiling primitive a
  * 100 TB pipeline runs constantly (stop-band detection for LSH,
  * boilerplate tokens, hot keys before a shuffle) where an exact
  * GROUP BY would materialize the open-vocabulary tail: the sketch is
  * O(k) memory per group NO MATTER the stream length — the classic
  * Misra–Gries guarantee (true_count − estimate ≤ n/(k+1)) with the
  * mergeable-summaries combine (Agarwal et al., "Mergeable
  * Summaries": element-wise sum, then subtract the (k+1)-th largest
  * count and drop non-positives — the bound survives arbitrary merge
  * trees, which is exactly Spark's partial-aggregation contract).
  *
  * Exactness gate (how the oracle checks an approximate op, the q59
  * pattern): with k ≥ the group's distinct-item count, no decrement
  * and no merge-truncation can ever fire, so the sketch DEGENERATES
  * to exact counts — q81 runs the aggregator in that regime against a
  * plain GROUP BY oracle, while the spec pins the error bound and
  * merge-order invariance in the lossy regime.
  *
  * Buffers are immutable maps re-keyed per row — fine for the k's a
  * profiler uses (k ≤ a few hundred); a production hot-path variant
  * would carry a mutable open-addressing buffer behind the same
  * merge contract.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "k must be at least 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < k => b.updated(a, 1L)
      case None =>
        // all k counters occupied: decrement everyone, drop zeros
        // (the arriving item's +1 and its own -1 cancel)
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long])
      : Map[String, Long] = {
    val m = (x.keySet ++ y.keySet).iterator
      .map(t => t -> (x.getOrElse(t, 0L) + y.getOrElse(t, 0L))).toMap
    if (m.size <= k) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
      m.flatMap { case (t, c) =>
        if (c - cut > 0L) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  // a real map encoder both ways: the buffer shuffles as a typed map
  // column (partial aggregation), never an opaque blob
  private val enc: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def bufferEncoder: Encoder[Map[String, Long]] = enc
  override def outputEncoder: Encoder[Map[String, Long]] = enc
}
