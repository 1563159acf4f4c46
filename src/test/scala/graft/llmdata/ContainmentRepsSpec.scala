package graft.llmdata

import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Gates for q213's rep-mode containment contract (round-11: the
  * production lever SCALE.md's round-10 q75 profile named). The
  * load-bearing property is LOSSLESSNESS: the rep-mode output must
  * encode exactly q75's expanded pair set — Σ n_pairs equals q75's row
  * count, and decoding each row (intra: ordered member pairs of the
  * group; cross: members(a) × members(b) carrying the rep value)
  * reproduces q75's rows verbatim. A rep-mode that dropped or
  * double-counted a cluster would ship a corrupted dedup artifact that
  * every downstream consumer silently trusts. */
class ContainmentRepsSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("sum of n_pairs equals q75's expanded row count (lossless encoding)") {
    val reps = SparkEntry.queries("q213_containment_reps")(spark, sf)
    val full = SparkEntry.queries("q75_containment")(spark, sf)
    val encoded = reps.agg(sum("n_pairs")).head().getLong(0)
    val expanded = full.count()
    assert(encoded == expanded,
      s"rep-mode encodes $encoded ordered pairs, q75 materializes " +
        s"$expanded — the contracts must carry the same pair set")
  }

  test("decoding the rep rows reproduces q75's rows exactly") {
    val reps = graft.Caches.persist(
      SparkEntry.queries("q213_containment_reps")(spark, sf))
    // group membership — same definition the engine uses (lang +
    // token-set fingerprint, gid = min doc_id), recomputed here
    // independently from the raw corpus
    val members = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), Text.setFp.as("fp"))
      .withColumn("gid", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang", "fp")))
      .select("doc_id", "gid")
    val intra = reps.filter(col("a_gid") === col("b_gid"))
      .join(members.select(col("doc_id").as("a_id"),
        col("gid").as("a_gid")), "a_gid")
      .join(members.select(col("doc_id").as("b_id"),
        col("gid").as("b_gid")), "b_gid")
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("containment"))
    val cross = reps.filter(col("a_gid") =!= col("b_gid"))
      .join(members.select(col("doc_id").as("a_id"),
        col("gid").as("a_gid")), "a_gid")
      .join(members.select(col("doc_id").as("b_id"),
        col("gid").as("b_gid")), "b_gid")
      .select(col("a_id"), col("b_id"), col("containment"))
    val decoded = intra.unionByName(cross)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val full = SparkEntry.queries("q75_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(decoded.length == full.length,
      s"decoded ${decoded.length} vs q75 ${full.length}")
    assert(decoded.sameElements(full),
      "decoded rep rows must reproduce q75's (a_id, b_id, containment) " +
        "rows bit-for-bit (cross pairs carry the rep value verbatim)")
  }

  test("output is rep-bounded: no member-expanded row survives, sizes are honest") {
    val reps = SparkEntry.queries("q213_containment_reps")(spark, sf)
      .collect()
    assert(reps.nonEmpty, "fixture corpus has dup clusters")
    // every intra row n >= 2, n_pairs = n(n-1); every cross row
    // n_pairs = n_a*n_b
    reps.foreach { r =>
      val (aG, bG) = (r.getLong(0), r.getLong(1))
      val (nA, nB, nP) = (r.getLong(3), r.getLong(4), r.getLong(5))
      if (aG == bG) {
        assert(nA == nB && nA >= 2 && nP == nA * (nA - 1),
          s"intra row ($aG): n=$nA n_pairs=$nP")
        assert(r.getDouble(2) == 1.0, "identical sets contain exactly")
      } else assert(nP == nA * nB, s"cross row ($aG,$bG)")
    }
  }
}
