package graft.llmdata

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Persisted cross-family ANN tuner choice — the tune-once/serve-many
  * artifact behind q210/q211 (round-9 verdict item 1).
  *
  * Through round 9 the tuned search (q211) re-derived the ENTIRE q210
  * sweep in-plan — training three k-means quantizers, pricing 26
  * configs, validating the argmin — on every execution, making it the
  * registry's most expensive query at both scale factors (5.0 s sf0.1 /
  * 14.4 s sf1). At 100 TB a user tunes once and serves many: the tuner
  * is a scheduled job whose OUTPUT is this artifact, and the search
  * reads it. What the artifact must carry is exactly what a fresh
  * sweep would have handed the application leg:
  *
  *   - the validated choice `(family, p1, p2)` — which index to probe;
  *   - EVERY trained quantizer (int8 centroids + squared norms), not
  *     just the winner's: the cross-engine oracle replays the whole
  *     sweep from the centroid literals, and a retune-after-drift
  *     must not silently inherit half the grid;
  *   - a corpus fingerprint, so serving against a corpus the choice
  *     was never tuned on REFUSES loudly instead of silently applying
  *     a stale index config (the q136 drift-audit direction: an index
  *     tuned on yesterday's distribution can under-recall today's).
  *
  * Persistence rides [[graft.sources.AppendLog]] — the same
  * manifest/lock protocol as the incremental LSH and inverted-index
  * seams (q109/q132 discipline): each tuning appends ONE immutable
  * 1-row batch and commits it through an atomic manifest rename, so a
  * crashed tuner leaves unreferenced garbage, never a torn artifact,
  * and concurrent tuners serialize on the ingest lock. Readers take
  * the row with the highest `seq` (the manifest version at write) —
  * retuning after drift is an append, and `AppendLog.compact`
  * reclaims superseded rows.
  *
  * Scale shape: the artifact is k×64 int8-valued doubles per quantizer
  * plus five scalars — a driver-side read is the same bounded class as
  * a collected scalar aggregate, at any corpus size.
  */
object AnnChoice {
  /** Stamped into [[defaultDir]]'s key: bump when the sweep's
    * semantics change (grid, recall target, validation protocol, or
    * the training fold), so an artifact produced by older tuner code
    * can never serve a registry whose oracle replays the NEW sweep. */
  val FormatVersion = 1

  /** One persisted tuning: corpus fingerprint, validated choice, and
    * every trained quantizer of the sweep. */
  final case class Artifact(fpCount: Long, fpXor: Long, family: String,
      p1: Int, p2: Int, quants: Seq[Similarity.IvfQuant]) {
    def matches(fp: (Long, Long)): Boolean =
      fpCount == fp._1 && fpXor == fp._2
  }

  val Schema: StructType = StructType(Seq(
    StructField("fp_count", LongType, nullable = false),
    StructField("fp_xor", LongType, nullable = false),
    StructField("family", StringType, nullable = false),
    StructField("p1", IntegerType, nullable = false),
    StructField("p2", IntegerType, nullable = false),
    StructField("quants", ArrayType(StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("nlists", IntegerType, nullable = false),
      StructField("qcents",
        ArrayType(ArrayType(DoubleType, containsNull = false),
          containsNull = false), nullable = false),
      StructField("ncs", ArrayType(DoubleType, containsNull = false),
        nullable = false))), containsNull = false), nullable = false),
    StructField("seq", IntegerType, nullable = false)))

  /** The default stash location for a corpus directory: keyed by
    * format version + canonical path + fingerprint, so a regenerated
    * corpus (or retuned semantics) maps to a FRESH dir and the
    * auto-serving registry path can never read a stale artifact — the
    * explicit-dir API ([[Similarity.annFamilySearchFrom]]) is where
    * staleness is possible and is refused loudly. */
  def defaultDir(d: String, fp: (Long, Long)): String = {
    val real =
      try new java.io.File(d).getCanonicalPath
      catch { case _: java.io.IOException => d }
    val key = s"v$FormatVersion|$real|${fp._1}|${fp._2}"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString
    s"${sys.props("java.io.tmpdir")}/graft-ann-choice/$hex"
  }

  /** Appends one tuning through the AppendLog manifest protocol.
    * Refuses loudly when another tuner holds the ingest lock. */
  def persist(s: SparkSession, stashDir: String, a: Artifact): Unit =
    graft.sources.AppendLog.append(s, stashDir) { (v, _, batchName) =>
      val row = Row(a.fpCount, a.fpXor, a.family, a.p1, a.p2,
        a.quants.map(qt => Row(qt.idx, qt.nlists, qt.qcents, qt.ncs)),
        v + 1)
      val rows = new java.util.ArrayList[Row](); rows.add(row)
      s.createDataFrame(rows, Schema)
        .coalesce(1).write.parquet(s"$stashDir/$batchName")
    }

  /** Best-effort [[persist]] for the auto-serving registry path: a
    * concurrent tuner's lock (or a crashed one's leftover) must not
    * fail a query that already holds the choice in memory — the run
    * serves correctly either way, only the NEXT run's warm start is
    * at stake. Returns whether the artifact landed. */
  def persistBestEffort(s: SparkSession, stashDir: String,
      a: Artifact): Boolean =
    try { persist(s, stashDir, a); true }
    catch {
      case e: IllegalStateException =>
        System.err.println(s"[ann-choice] WARNING: could not persist " +
          s"the tuned choice to $stashDir (${e.getMessage.takeWhile(_ != '\n')}) " +
          "- serving from the in-memory choice; the next run re-tunes")
        false
    }

  /** The latest committed tuning at `stashDir` — `None` for a fresh
    * or absent stash. Bounded driver read: one tiny row per tuning. */
  def read(s: SparkSession, stashDir: String): Option[Artifact] = {
    val rows = graft.sources.AppendLog.read(s, stashDir, Schema).collect()
    if (rows.isEmpty) None
    else {
      val r = rows.maxBy(_.getAs[Int]("seq"))
      // parquet arrays arrive as mutable ArraySeq in Scala 2.13 —
      // convert explicitly (scala.Seq = immutable.Seq since 2.13)
      val quants = r.getAs[scala.collection.Seq[Row]]("quants").map { q =>
        Similarity.IvfQuant(q.getInt(0), q.getInt(1),
          q.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](2)
            .map(_.toVector).toVector,
          q.getAs[scala.collection.Seq[Double]](3).toVector)
      }.toSeq
      Some(Artifact(r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getInt(4), quants))
    }
  }
}
