package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded grouped top-k as a Spark `Aggregator` — "top N rows per
  * key" without sorting whole partitions.
  *
  * Spark's idiomatic rendering (`row_number() OVER (PARTITION BY …
  * ORDER BY …) <= k`) SORTS every group in full — O(n log n) per group
  * and the whole fact table flows through the window sort. This
  * aggregator keeps an O(k) buffer per group (insert is a bounded
  * sorted-list merge, O(k) per row worst case; heap-equivalent),
  * combines under Spark's partial-aggregation merge tree (merge =
  * k-bounded list merge, associative/commutative given the TOTAL
  * order), and the group's output is already sorted. Same
  * rows-vs-TakeOrderedAndProject relationship as global top-k (q07) —
  * applied per group.
  *
  * Determinism: the order is the TOTAL lexicographic order on
  * (value desc, id asc) — ties cannot reorder across merge trees, so
  * the survivor set is unique and the result is exact, not
  * approximate: q92 checks it value-for-value against the window
  * oracle.
  */
final class TopK(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k >= 1, "k must be at least 1")

  /** (value desc, id asc): a is ranked strictly before b. Values
    * compare via `java.lang.Double.compare` — a TOTAL order (NaN sorts
    * as the largest value, matching Spark SQL's descending sort), so a
    * NaN input cannot make both directions false and silently drop a
    * row in `merge`'s equal-pair branch. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
    // + 0.0 normalizes -0.0 to +0.0 (NaN unaffected) — SQL engines
    // sort the two zeros as equal (Spark NormalizeFloatingNumbers)
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)], x: (Double, Long))
      : List[(Double, Long)] = {
    // b is sorted best-first and ≤ k long; insert + truncate
    val (pre, post) = b.span(e => before(e, x))
    val merged = pre ::: (x :: post)
    if (merged.length > k) merged.init else merged
  }

  override def merge(x: List[(Double, Long)], y: List[(Double, Long)])
      : List[(Double, Long)] = {
    @annotation.tailrec
    def go(a: List[(Double, Long)], b: List[(Double, Long)],
        acc: List[(Double, Long)], n: Int): List[(Double, Long)] =
      if (n == k) acc.reverse
      else (a, b) match {
        case (Nil, Nil) => acc.reverse
        case (ha :: ta, hb :: _) if before(ha, hb) => go(ta, b, ha :: acc, n + 1)
        case (ha :: _, hb :: tb) if before(hb, ha) => go(a, tb, hb :: acc, n + 1)
        case (ha :: ta, _ :: tb) => go(ta, tb, ha :: acc, n + 1) // equal pair: impossible for distinct ids, keep one
        case (ha :: ta, Nil) => go(ta, Nil, ha :: acc, n + 1)
        case (Nil, hb :: tb) => go(Nil, tb, hb :: acc, n + 1)
      }
    go(x, y, Nil, 0)
  }

  override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b

  private val bufEnc: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  private val outEnc: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def bufferEncoder: Encoder[List[(Double, Long)]] = bufEnc
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = outEnc
}
