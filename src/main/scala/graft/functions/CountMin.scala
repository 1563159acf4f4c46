package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Sparse/dense buffer: `dense.isEmpty` ⟺ sparse mode, where `sparse`
  * is the exact per-item count map; once dense, `sparse` is empty and
  * `dense` holds the depth·width counter matrix, row-major. */
final case class CmBuf(sparse: Map[String, Long], dense: Array[Long])

/** Count-Min sketch as a Spark `Aggregator` — the sixth entry on the
  * custom-AGGREGATE extensibility surface (SURVEY §2.11), next to
  * MisraGries / QuantileSketchAgg / TopK / BloomAgg / HllAgg.
  *
  * What it adds over [[MisraGries]]: a point-frequency ESTIMATE for
  * ANY item, not just the k survivors — the "telemetry counter
  * lookup" shape (how often did THESE terms/device-ids/error-codes
  * occur per group), answered from O(depth·width) state per group
  * regardless of stream length or vocabulary (Cormode & Muthukrishnan
  * 2005, public). Each of `depth` rows hashes the item to one of
  * `width` counters; a query reads the MINIMUM across rows, so
  * estimates only ever OVER-count (collisions add, never subtract) —
  * the no-underestimate guarantee is deterministic, not
  * probabilistic, and is what makes the sketch safe as an admission /
  * rate-limit gate.
  *
  * Exactness regime (the q59/q81/q86/q110 oracle pattern): below
  * `sparseMax` distinct items the buffer is the exact count map —
  * estimates are exactly `count(*)` per item, absent items exactly 0,
  * value-for-value checkable by DuckDB (q115). Past it the buffer
  * densifies to the counter matrix (hash = MurmurHash3 seeded per
  * row).
  *
  * Mergeability (Spark's partial-aggregation contract): sparse∪sparse
  * is map-sum (promoting if it outgrows `sparseMax`); anything dense
  * absorbs the other side by counter-wise addition. Addition is
  * commutative and associative, so ANY merge tree yields the
  * IDENTICAL buffer (the HllAgg-strength guarantee — stronger than
  * MisraGries' truncation bound).
  *
  * `finish` emits the estimates for the fixed `probes` list (aligned
  * by position), which keeps the whole operator inside one aggregate
  * — the probe terms ride the plan as metadata, the shuffle carries
  * the O(depth·width + sparseMax) buffer, never the vocabulary.
  */
final class CountMin(probes: Seq[String], depth: Int = 4,
    width: Int = 256, sparseMax: Int = 1024)
    extends Aggregator[String, CmBuf, Seq[Long]] {
  require(depth >= 1 && width >= 1, "depth and width must be positive")
  require(sparseMax >= 0, "sparseMax must be non-negative")
  require(probes.nonEmpty, "probes must be non-empty")

  private def cell(row: Int, item: String): Int =
    row * width + java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(item, 0x9E3779B9 + row),
      width)

  private def densify(sparse: Map[String, Long]): Array[Long] = {
    val m = new Array[Long](depth * width)
    sparse.foreach { case (item, c) =>
      var r = 0
      while (r < depth) { m(cell(r, item)) += c; r += 1 }
    }
    m
  }

  private def addDense(m: Array[Long], item: String, c: Long): Unit = {
    var r = 0
    while (r < depth) { m(cell(r, item)) += c; r += 1 }
  }

  override def zero: CmBuf = CmBuf(Map.empty, Array.emptyLongArray)

  override def reduce(b: CmBuf, a: String): CmBuf =
    if (b.dense.nonEmpty) { addDense(b.dense, a, 1L); b }
    else {
      val s = b.sparse.updated(a, b.sparse.getOrElse(a, 0L) + 1L)
      if (s.size <= sparseMax) CmBuf(s, Array.emptyLongArray)
      else CmBuf(Map.empty, densify(s))
    }

  override def merge(x: CmBuf, y: CmBuf): CmBuf =
    (x.dense.nonEmpty, y.dense.nonEmpty) match {
      case (true, true) =>
        var i = 0
        while (i < x.dense.length) { x.dense(i) += y.dense(i); i += 1 }
        x
      case (true, false) =>
        y.sparse.foreach { case (t, c) => addDense(x.dense, t, c) }
        x
      case (false, true) =>
        x.sparse.foreach { case (t, c) => addDense(y.dense, t, c) }
        y
      case (false, false) =>
        val s = (x.sparse.keySet ++ y.sparse.keySet).iterator
          .map(t => t -> (x.sparse.getOrElse(t, 0L) +
            y.sparse.getOrElse(t, 0L))).toMap
        if (s.size <= sparseMax) CmBuf(s, Array.emptyLongArray)
        else CmBuf(Map.empty, densify(s))
    }

  /** Point estimate: exact in sparse mode; min across rows in dense. */
  private def estimate(b: CmBuf, item: String): Long =
    if (b.dense.isEmpty) b.sparse.getOrElse(item, 0L)
    else {
      var m = Long.MaxValue
      var r = 0
      while (r < depth) {
        val v = b.dense(cell(r, item)); if (v < m) m = v; r += 1
      }
      m
    }

  override def finish(b: CmBuf): Seq[Long] = probes.map(estimate(b, _))

  private val bufEnc: Encoder[CmBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CmBuf]()
  private val outEnc: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def bufferEncoder: Encoder[CmBuf] = bufEnc
  override def outputEncoder: Encoder[Seq[Long]] = outEnc
}
