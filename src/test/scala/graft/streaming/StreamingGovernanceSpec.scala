package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingGovernanceSpec extends SparkSpec {
  import StreamingGovernance.{QiRow, Released}

  private val sf = "/root/testdata/sf0.001"

  test("one-batch gate releases exactly the q139 census groups clearing k") {
    val sp = spark
    import sp.implicits._
    val cust = graft.Tables.customer(sp, sf)
    val released = StreamingGovernance
      .gate(StreamingGovernance.customerQi(cust), k = 2)
      .select("row_id").as[Long].collect().toSet
    // independent batch computation of k-cleared QI groups
    val qi = cust.select(col("c_custkey"),
      concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long")).as("qi"))
    val open = qi.groupBy("qi").count().filter(col("count") >= 2)
    val expect = qi.join(open, Seq("qi"), "left_semi")
      .select("c_custkey").as[Long].collect().toSet
    assert(released == expect,
      "released rows must be exactly the members of k-cleared QI groups")
    assert(released.nonEmpty && released.size < cust.count())
  }

  test("a group opens retroactively across micro-batches, in arrival order") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[QiRow](sp)
    val q = StreamingGovernance.gate(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("gov_cross").start()
    try {
      input.addData(QiRow(10, "g"), QiRow(11, "g"))
      q.processAllAvailable()
      assert(sp.table("gov_cross").count() == 0,
        "a 2-member group must stay suppressed at k=3")
      input.addData(QiRow(12, "g"))
      q.processAllAvailable()
      val rel = sp.table("gov_cross").as[Released].collect()
        .sortBy(_.group_n)
      assert(rel.map(_.row_id).toSeq == Seq(10L, 11L, 12L),
        "the k-th arrival flushes the buffered history in arrival order")
      assert(rel.map(_.group_n).toSeq == Seq(1L, 2L, 3L))
      // once open: immediate passthrough with a growing census
      input.addData(QiRow(13, "g"))
      q.processAllAvailable()
      val all = sp.table("gov_cross").as[Released].collect()
      assert(all.exists(r => r.row_id == 13L && r.group_n == 4L))
    } finally q.stop()
  }

  test("at-least-once replay neither re-releases nor double-counts") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[QiRow](sp)
    val q = StreamingGovernance.gate(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("gov_replay").start()
    try {
      input.addData(QiRow(1, "g"), QiRow(2, "g"))
      q.processAllAvailable()
      // replay the same rows: a doubled count would open the group at
      // 2 real subjects - the privacy violation the id memory prevents
      input.addData(QiRow(1, "g"), QiRow(2, "g"))
      q.processAllAvailable()
      assert(sp.table("gov_replay").count() == 0,
        "replayed rows must not open a k=3 group with 2 subjects")
      input.addData(QiRow(3, "g"))
      q.processAllAvailable()
      val rel = sp.table("gov_replay").as[Released].collect()
      assert(rel.map(_.row_id).toSet == Set(1L, 2L, 3L))
      assert(rel.map(_.group_n).max == 3L, "census counts real subjects")
    } finally q.stop()
  }

  test("independent QI groups gate independently") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[QiRow](sp)
    val q = StreamingGovernance.gate(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("gov_indep").start()
    try {
      input.addData(QiRow(1, "a"), QiRow(2, "a"), QiRow(3, "b"))
      q.processAllAvailable()
      val rel = sp.table("gov_indep").as[Released].collect()
      assert(rel.map(_.row_id).toSet == Set(1L, 2L),
        "group a clears k=2; the singleton in b stays suppressed")
    } finally q.stop()
  }

  test("one-batch diverse gate releases exactly the q140 census groups clearing (k, l)") {
    val sp = spark
    import sp.implicits._
    val orders = graft.Tables.orders(sp, sf)
    val cust = graft.Tables.customer(sp, sf)
    val in = StreamingGovernance.orderSens(orders, cust)
    val released = StreamingGovernance.gateDiverse(in, k = 3, l = 3)
      .select("row_id").as[Long].collect().toSet
    // independent census: groups with >= 3 orders AND >= 3 distinct statuses
    val open = in.groupBy("qi")
      .agg(count(lit(1)).as("n"), countDistinct(col("sens")).as("l"))
      .filter(col("n") >= 3 && col("l") >= 3)
    val expect = in.join(open, Seq("qi"), "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(released == expect,
      "released rows must be exactly the members of (k,l)-cleared QI groups")
    assert(released.nonEmpty && released.size < orders.count())
    // the gate must be STRICTER than k alone: some k-cleared group is
    // homogeneous on this corpus, else the test pins nothing
    val kOnly = in.groupBy("qi").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
    val kExpect = in.join(kOnly, Seq("qi"), "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(released.subsetOf(kExpect) && released != kExpect,
      "l-diversity must suppress at least one high-k homogeneous group")
  }

  test("a high-k homogeneous group stays suppressed until the l-th distinct value") {
    val sp = spark
    import sp.implicits._
    import StreamingGovernance.{SensRow, ReleasedDiverse}
    val input = MemoryStream[SensRow](sp)
    val q = StreamingGovernance.gateDiverse(input.toDS(), k = 2, l = 2)
      .writeStream.format("memory").queryName("gov_div").start()
    try {
      // 4 rows, one sensitive value: clears k=2 four times over, l=1
      input.addData(SensRow(1, "g", "F"), SensRow(2, "g", "F"),
        SensRow(3, "g", "F"), SensRow(4, "g", "F"))
      q.processAllAvailable()
      assert(sp.table("gov_div").count() == 0,
        "k alone must not open a homogeneous group")
      // the l-th distinct sensitive value retroactively opens it
      input.addData(SensRow(5, "g", "O"))
      q.processAllAvailable()
      val rel = sp.table("gov_div").as[ReleasedDiverse].collect()
        .sortBy(_.group_n)
      assert(rel.map(_.row_id).toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        "diversification flushes the whole buffered history in arrival order")
      assert(rel.forall(_.l == 2L), "released rows carry the group's l")
      // once open: immediate passthrough, l keeps growing
      input.addData(SensRow(6, "g", "P"))
      q.processAllAvailable()
      val all = sp.table("gov_div").as[ReleasedDiverse].collect()
      assert(all.exists(r => r.row_id == 6L && r.group_n == 6L && r.l == 3L))
    } finally q.stop()
  }

  test("diverse-gate replay re-counts neither rows nor sensitive values") {
    val sp = spark
    import sp.implicits._
    import StreamingGovernance.{SensRow, ReleasedDiverse}
    val input = MemoryStream[SensRow](sp)
    val q = StreamingGovernance.gateDiverse(input.toDS(), k = 3, l = 2)
      .writeStream.format("memory").queryName("gov_div_replay").start()
    try {
      input.addData(SensRow(1, "g", "F"), SensRow(2, "g", "O"))
      q.processAllAvailable()
      // replay: the same 2 rows already clear l=2; a doubled row count
      // would open the group at 2 real subjects
      input.addData(SensRow(1, "g", "F"), SensRow(2, "g", "O"))
      q.processAllAvailable()
      assert(sp.table("gov_div_replay").count() == 0,
        "replayed rows must not open a k=3 group with 2 subjects")
      input.addData(SensRow(3, "g", "F"))
      q.processAllAvailable()
      val rel = sp.table("gov_div_replay").as[ReleasedDiverse].collect()
      assert(rel.map(_.row_id).toSet == Set(1L, 2L, 3L))
      assert(rel.map(_.group_n).max == 3L && rel.forall(_.l == 2L))
    } finally q.stop()
  }

  test("stateTtl expires an idle small group's state; suppression holds") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[QiRow](sp)
    val q = StreamingGovernance
      .gate(input.toDS(), k = 3,
        stateTtl = Some(java.time.Duration.ofMillis(100)))
      .writeStream.format("memory").queryName("gov_ttl").start()
    // With a processing-time timeout armed, the micro-batch loop keeps
    // scheduling timeout-check batches, so processAllAvailable never
    // reports idle — progress is observed through an always-open
    // MARKER group ("m", released immediately at k=3) polled off the
    // sink instead.
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (sp.table("gov_ttl").count() < n &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(sp.table("gov_ttl").count() >= n,
        s"sink never reached $n rows")
    }
    try {
      input.addData(QiRow(1, "g"), QiRow(2, "g"),
        QiRow(10, "m"), QiRow(11, "m"), QiRow(12, "m"))
      awaitRows(3) // the marker group released ⇒ batch 1 fully applied
      assert(!sp.table("gov_ttl").as[Released].collect().exists(_.qi == "g"),
        "a 2-member group must stay suppressed at k=3")
      Thread.sleep(1000) // TTL lapses; timeout batches drop ALL state
      // g's buffer + armor are gone; a late third member finds an
      // empty group and stays suppressed — the privacy-SAFE direction.
      // The old marker group's release memory expired too (row 13
      // below re-buffers at size 1), so a FRESH 3-row marker group is
      // the progress signal for this batch.
      input.addData(QiRow(3, "g"), QiRow(13, "m"),
        QiRow(20, "m2"), QiRow(21, "m2"), QiRow(22, "m2"))
      awaitRows(6) // fresh marker group released ⇒ the batch applied
      val rel = sp.table("gov_ttl").as[Released].collect()
      assert(!rel.exists(_.qi == "g"),
        "after expiry the group must re-count from zero (no release at 1)")
      assert(rel.count(_.qi == "m") == 3 && rel.count(_.qi == "m2") == 3,
        "expired open group m re-counts from zero as well (row 13 buffers)")
    } finally q.stop()
  }

  test("maxBuffered backstop fails LOUDLY on a hot homogeneous group, never silently drops") {
    val sp = spark
    import sp.implicits._
    import StreamingGovernance.SensRow
    // k cleared, never diversifies: buffer would grow without bound
    val hot = (1L to 10L).map(i => SensRow(i, "g", "same")).toDS()
    val e = intercept[Exception] {
      StreamingGovernance.gateDiverse(hot, k = 2, l = 2,
        maxBuffered = Some(3)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null)
      && causes(e).exists(c => c.getMessage != null
        && c.getMessage.contains("maxBuffered")),
      s"expected the loud backstop message, got: $e")
    // a diversifying group under the same cap releases normally
    val ok = ((1L to 3L).map(i => SensRow(i, "g", "same")) :+
      SensRow(4L, "g", "other")).toDS()
    val rel = StreamingGovernance.gateDiverse(ok, k = 2, l = 2,
      maxBuffered = Some(10)).collect()
    assert(rel.length == 4, "the cap must not change release semantics")
    // a cap below k is a configuration error, refused at once
    val bad = intercept[IllegalArgumentException] {
      StreamingGovernance.gateDiverse(hot, k = 5, l = 2,
        maxBuffered = Some(3))
    }
    assert(bad.getMessage.contains("never release"))
  }

  test("the row that breaches the cap but satisfies (k, l) releases, not fails") {
    val sp = spark
    import sp.implicits._
    import StreamingGovernance.SensRow
    // maxBuffered = k = 2: rows 1-2 homogeneous (cleared k, awaiting
    // l), row 3 BREACHES the cap (buffer 3 > 2) and simultaneously
    // brings the l-th distinct sensitive value. The backstop must run
    // AFTER the release test — failing first would lose availability
    // one row earlier than the privacy rule requires (round-8 advice).
    val edge = Seq(SensRow(1L, "g", "same"), SensRow(2L, "g", "same"),
      SensRow(3L, "g", "other")).toDS()
    val rel = StreamingGovernance.gateDiverse(edge, k = 2, l = 2,
      maxBuffered = Some(2)).collect()
    assert(rel.length == 3,
      "a group satisfying (k, l) on the cap-breaching row must release")
  }
}
