package graft.functions

import graft.SparkSpec
import graft.anomaly.SpikeAndDip
import org.apache.spark.sql.Row

/** The native spike_score Expression: SQL registration, codegen path,
  * and agreement with the plain-Scala scorer. */
class SpikeScoreSpec extends SparkSpec {

  test("SQL invocation via the registered function (extensions)") {
    val flat = (1 to 40).map(i => 10.0 + 0.1 * (i % 5)).mkString(",")
    val r = spark.sql(
      s"""SELECT spike_score(array($flat), 100.0D) AS spike,
         |       spike_score(array($flat), 10.0D)  AS calm,
         |       spike_score(array($flat), 0.0D, 95.0, 85, 'spikes') AS dirOnly
         |""".stripMargin).collect().head
    assert(r.getAs[Row]("spike").getInt(0) == 1)
    assert(r.getAs[Row]("calm").getInt(0) == 0)
    assert(r.getAs[Row]("dirOnly").getInt(0) == 0) // dip, spikes-only mode
  }

  test("null value → (0, 0.0); empty/short history → not anomalous") {
    val r = spark.sql(
      """SELECT spike_score(array(1.0D, 2.0D), CAST(NULL AS DOUBLE)) AS n,
        |       spike_score(array(1.0D, 2.0D), 100.0D) AS shortHist
        |""".stripMargin).collect().head
    // a null signal is quiet, not null — the reference's CASE semantics
    assert(r.getAs[Row]("n").getInt(0) == 0)
    assert(r.getAs[Row]("n").getDouble(1) == 0.0)
    assert(r.getAs[Row]("shortHist").getInt(0) == 0)
  }

  test("expression agrees with the plain-Scala scorer incl. history cap") {
    val hist = (1 to 120).map(i => (i % 13).toDouble)
    val v = 25.0
    val expected = SpikeAndDip.score(
      hist.takeRight(SpikeAndDip.Params().historySize).toArray, v,
      SpikeAndDip.Params())
    val got = spark.sql(
      s"SELECT spike_score(array(${hist.mkString("D,")}D), ${v}D)")
      .collect().head.getStruct(0)
    assert(got.getInt(0) == expected._1)
    assert(math.abs(got.getDouble(1) - expected._2) < 1e-12)
  }
}
