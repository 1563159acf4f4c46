package graft.llmdata

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Independent recompute for q201's facility-location greedy: a
  * driver-side greedy over the collected (doc, trigram) sets must pick
  * the same docs with the same marginal gains, and the greedy sequence
  * must exhibit the submodular signature (non-increasing gains). */
class CoverageSelectSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("greedy picks, gains, and cumulative coverage match brute force; gains non-increasing") {
    val rows = SparkEntry.queries("q201_facility_location")(spark, sf)
      .collect().sortBy(_.getAs[Long]("rnk"))
    assert(rows.length == 3)
    // brute-force: same trigram extraction, driver-side greedy
    val docSets: Map[Long, Set[String]] = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3).collect()
      .map { r =>
        val t = r.getSeq[String](1)
        r.getLong(0) -> t.sliding(3).map(_.mkString(" ")).toSet
      }.toMap
    val vocab = docSets.values.flatten.toSet.size.toLong
    var covered = Set.empty[String]
    val expect = (1 to 3).map { _ =>
      val (doc, gain) = docSets.view
        .mapValues(ws => (ws -- covered).size).toSeq
        .filter(_._2 > 0)
        .minBy { case (id, g) => (-g, id) } // max gain, lowest id
      covered ++= docSets(doc)
      (doc, gain.toLong)
    }
    rows.zip(expect).zipWithIndex.foreach { case ((row, (doc, gain)), i) =>
      assert(row.getAs[Long]("doc_id") == doc, s"step ${i + 1}: selected doc")
      assert(row.getAs[Long]("gain") == gain, s"step ${i + 1}: marginal gain")
    }
    assert(rows.map(_.getAs[Long]("vocab")).distinct.toSeq == Seq(vocab))
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.sameElements(gains.sortBy(-_)),
      "greedy marginal gains must be non-increasing (submodularity)")
    val cums = rows.map(_.getAs[Long]("covered_cum"))
    assert(cums.toSeq == gains.scanLeft(0L)(_ + _).tail.toSeq)
    assert(cums.last == expect.map(_._1).flatMap(docSets).toSet.size.toLong,
      "cumulative coverage must equal the true union size of the picks")
  }
}
