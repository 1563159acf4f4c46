package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental (streaming) embedding near-neighbor detection — the
  * streaming twin of the batch sign-bucket ANN (q32) and semantic
  * dedup (q83): "is this newly embedded item semantically close to
  * anything seen before?", answered at arrival, without re-scanning
  * the corpus.
  *
  *  1. [[bucketed]] — normalize + 8-plane sign-bucket per row. Pure
  *     projections (no shuffle, no state), the SAME bucket definition
  *     as q32/q83, so streaming detections can be verified offline
  *     against the batch operators.
  *  2. [[neighbors]] — `groupByKey(bucket).flatMapGroupsWithState`:
  *     state per bucket is the (bounded) list of prior normalized
  *     vectors; each arrival emits one pair per retained prior vector
  *     whose EXACT cosine clears `minCos`, then joins the bucket.
  *
  * Unlike [[StreamingDedup]] (candidates-not-verdicts: token sets are
  * too big for state), the normalized vector IS the similarity
  * evidence and lives in state anyway — so emissions here are exact
  * in-bucket verdicts, not candidates. Cross-bucket near-dups (sign
  * flips on a near-zero plane) are the recall gap, same as batch q83;
  * multi-probe (emit to Hamming-1 buckets too) is the recall knob.
  *
  * Replay: arrivals are remembered by id — retained or overflowed, a
  * replayed vector re-emits nothing (at-least-once safe), same
  * contract and same BOUNDED overflow memory as [[StreamingDedup]]
  * (exact for the retained window, best-effort beyond it).
  *
  * Scale (100 TB, 1000 executors): shuffle + state key on the bucket
  * (2^planes spread; planes grow with the corpus), each vector's
  * state footprint is dim doubles; `maxPerBucket` hard-bounds a hot
  * bucket (stop admitting, keep matching, remember turned-away ids).
  * RocksDB state store; TTL matched to the dedup horizon in
  * production (NoTimeout here: the horizon is "ever seen").
  */
object StreamingAnn {

  /** One normalized arrival with its sign-bucket key. */
  final case class VecRow(vec_id: Long, bucket: Long, vn: Seq[Double])

  /** A retained prior vector in a bucket. */
  final case class BucketVec(vec_id: Long, vn: Seq[Double])

  /** Per-bucket state: retained vectors (newest first) + turned-away
    * ids (replay memory, BOUNDED at [[StreamingDedup.overflowMemoryFactor]]
    * × maxPerBucket like [[StreamingDedup]]: unbounded it would grow one
    * id per turned-away arrival — the hot-bucket blow-up `maxPerBucket`
    * exists to prevent). A replay of an evicted id re-emits its pairs
    * (at-least-once duplication, never wrong pairs); `overflowCount` is
    * the running total and survives eviction.
    *
    * CHECKPOINT COMPATIBILITY: this case class IS the fMGWS state
    * encoder schema; the round-5 `overflowIds`/`overflowCount` fields
    * broke checkpoints written by earlier builds (see
    * [[StreamingDedup.BandState]] for the restart-from-scratch
    * procedure and the versioning rule for future changes). `ver` is
    * the state-schema version, checked on restore ([[StateVersion]]);
    * bump [[BucketStateVer]] on any semantic change. */
  final case class BucketState(vecs: List[BucketVec], overflowIds: List[Long],
      overflowCount: Long, ver: Int = BucketStateVer)

  /** Current BucketState schema version (v2 = v1 + overflow replay
    * memory + this version field). */
  final val BucketStateVer = 2

  /** An emitted exact in-bucket neighbor pair (a_id < b_id). */
  final case class Neighbor(a_id: Long, b_id: Long, bucket: Long,
      cosine: Double)

  /** Normalized vectors + q32's 8-plane sign bucket for a
    * (vec_id, embedding) frame — stateless, batch or streaming;
    * zero-norm vectors are dropped (no cosine is defined for them). */
  def bucketed(vecs: DataFrame): Dataset[VecRow] = {
    import vecs.sparkSession.implicits._
    vecs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        graft.llmdata.Similarity.signBucket(col("embedding")).as("bucket"))
      .withColumn("nrm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), col("bucket"),
        transform(col("v"), x => x / col("nrm")).as("vn"))
      .as[VecRow]
  }

  /** The stateful neighbor stage; works under a streaming query
    * (cross-batch state) and in batch mode (each bucket once). */
  def neighbors(in: Dataset[VecRow], maxPerBucket: Int = 1024,
      minCos: Double = 0.42): Dataset[Neighbor] = {
    import in.sparkSession.implicits._
    val overflowCap = StreamingDedup.overflowMemoryFactor * maxPerBucket
    def fn(bucket: Long, rows: Iterator[VecRow],
        st: GroupState[BucketState]): Iterator[Neighbor] = {
      val prev = st.getOption.getOrElse(BucketState(Nil, Nil, 0L))
      StateVersion.check(prev.ver, BucketStateVer, "StreamingAnn.neighbors")
      var kept = prev.vecs
      var over = prev.overflowIds
      var overCount = prev.overflowCount
      // probe the replay memory as a Set: O(1) per arrival instead of
      // an O(|overflowIds|) list scan on every row of a hot bucket
      var overSet = over.toSet
      val out = List.newBuilder[Neighbor]
      // deterministic within-batch order: ids, not partition order
      rows.toSeq.sortBy(_.vec_id).foreach { r =>
        if (!kept.exists(_.vec_id == r.vec_id) && !overSet.contains(r.vec_id)) {
          kept.foreach { p =>
            var acc = 0.0
            var i = 0
            val a = r.vn
            val b = p.vn
            while (i < a.length) { acc += a(i) * b(i); i += 1 }
            if (acc > minCos)
              out += Neighbor(math.min(p.vec_id, r.vec_id),
                math.max(p.vec_id, r.vec_id), bucket, acc)
          }
          if (kept.size < maxPerBucket) kept = BucketVec(r.vec_id, r.vn) :: kept
          else { over = r.vec_id :: over; overSet += r.vec_id; overCount += 1 }
        }
      }
      // cap the replay memory (newest-first list: take keeps newest)
      if (over.length > overflowCap) over = over.take(overflowCap)
      st.update(BucketState(kept, over, overCount))
      out.result().iterator
    }
    in.groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Convenience: vecs(vec_id, embedding) → exact in-bucket pairs. */
  def neighborsForVecs(vecs: DataFrame, maxPerBucket: Int = 1024,
      minCos: Double = 0.42): Dataset[Neighbor] =
    neighbors(bucketed(vecs), maxPerBucket, minCos)
}
