package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC upsert: the maintained table must always equal the
  * batch fold of the change history, micro-batch replays must be
  * no-ops (idempotent apply — the designed contrast with the
  * append-only index sink's high-water-mark armor), and a micro-batch
  * must rewrite ONLY the buckets it touches. */
class StreamingUpsertSpec extends SparkSpec {

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("upsert").toString + "/t"

  private def chg(rows: Seq[(Long, Long, String, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("id", "seq", "op", "payload")
  }

  private def contents(dir: String): Seq[(Long, String)] =
    StreamingUpsert.readTable(spark, dir).get
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("one batch applies upserts and drops deletes") {
    val dir = tmpTable()
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (1L, 1L, "U", "a"), (2L, 2L, "U", "b"), (3L, 3L, "U", "c"),
      (2L, 4L, "D", ""))))
    assert(contents(dir) == Seq((1L, "a"), (3L, "c")))
  }

  test("within-batch conflicts resolve by seq, cross-batch by arrival") {
    val dir = tmpTable()
    // id 5: two upserts in one batch — highest seq wins
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (5L, 1L, "U", "old"), (5L, 9L, "U", "new"), (6L, 2L, "U", "x"))))
    assert(contents(dir) == Seq((5L, "new"), (6L, "x")))
    // next batch: update 5, delete 6, insert 7
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (5L, 10L, "U", "newer"), (6L, 11L, "D", ""), (7L, 12L, "U", "y"))))
    assert(contents(dir) == Seq((5L, "newer"), (7L, "y")))
  }

  test("replaying a micro-batch is a no-op — apply is idempotent") {
    val dir = tmpTable()
    val b1 = Seq((1L, 1L, "U", "a"), (2L, 2L, "U", "b"))
    val b2 = Seq((1L, 3L, "U", "a2"), (3L, 4L, "U", "c"), (2L, 5L, "D", ""))
    StreamingUpsert.applyBatch(spark, dir, 4, chg(b1))
    StreamingUpsert.applyBatch(spark, dir, 4, chg(b2))
    val once = contents(dir)
    // at-least-once: the LAST batch re-runs after a crash
    StreamingUpsert.applyBatch(spark, dir, 4, chg(b2))
    assert(contents(dir) == once)
  }

  test("a micro-batch writes new generations only for touched buckets") {
    val dir = tmpTable()
    // ids 0..7 across 4 buckets (id mod 4)
    StreamingUpsert.applyBatch(spark, dir, 4,
      chg((0L to 7L).map(i => (i, i, "U", s"v$i"))))
    def listing(gen: String): Seq[(String, Long, Long)] = {
      val p = new java.io.File(s"$dir/$gen")
      p.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified))
        .sortBy(_._1)
    }
    val (v1, m1) = StreamingUpsert.state(spark, dir)
    assert(v1 == 1 && m1.keySet == Set(0L, 1L, 2L, 3L))
    val before = (0L until 4L).map(b => listing(m1(b)))
    // touch only bucket 1 (id 9 mod 4 = 1)
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq((9L, 99L, "U", "z"))))
    val (v2, m2) = StreamingUpsert.state(spark, dir)
    assert(v2 == 2)
    assert(m2(1L) == "bucket-1-g2", "touched bucket gets a new generation")
    for (b <- Seq(0L, 2L, 3L)) {
      assert(m2(b) == m1(b), s"untouched bucket $b keeps its generation")
      assert(listing(m2(b)) == before(b.toInt),
        s"bucket $b generation must be byte-stable on disk")
    }
    assert(contents(dir).size == 9)
  }

  test("readers get a cross-bucket-consistent snapshot across an apply") {
    val dir = tmpTable()
    StreamingUpsert.applyBatch(spark, dir, 4,
      chg((0L to 7L).map(i => (i, i, "U", s"v$i"))))
    val (v1, _) = StreamingUpsert.state(spark, dir)
    // a reader that resolved version 1 before the next apply reads
    // version 1's immutable generations — after the apply commits a
    // multi-bucket change, the OLD snapshot is still complete and
    // consistent (keepGenerations=2 retains it), never a torn mix
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (0L, 10L, "U", "w0"), (1L, 11L, "U", "w1"), (2L, 12L, "D", ""))))
    val old = StreamingUpsert.readVersion(spark, dir, v1).get
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(old == (0L to 7L).map(i => (i, s"v$i")),
      "the pre-apply snapshot must read complete and unchanged")
    assert(contents(dir) ==
      ((3L to 7L).map(i => (i, s"v$i")) ++ Seq((0L, "w0"), (1L, "w1")))
        .sorted)
  }

  test("a crashed attempt's uncommitted generation is replay-safe garbage") {
    val dir = tmpTable()
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (0L, 1L, "U", "a"), (1L, 2L, "U", "b"))))
    // simulate a crash mid-apply at version 2: a partial generation
    // dir exists but no manifest-2 references it
    val sp = spark
    import sp.implicits._
    Seq((999L, "junk")).toDF("id", "payload")
      .write.parquet(s"$dir/bucket-0-g2")
    assert(contents(dir) == Seq((0L, "a"), (1L, "b")),
      "readers never see the uncommitted generation")
    // the replay deletes the garbage and applies deterministically
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (0L, 3L, "U", "a2"), (4L, 4L, "U", "e"))))
    assert(contents(dir) == Seq((0L, "a2"), (1L, "b"), (4L, "e")))
  }

  test("a racing writer's commit loses LOUDLY — the published manifest is never overwritten") {
    val dir = tmpTable()
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq((0L, 1L, "U", "a"))))
    // simulate the race at the commit point itself: both writers read
    // v=1; the other one publishes manifest-2 first …
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest-2"),
      "0\tbucket-0-g1".getBytes("UTF-8"))
    // … then THIS writer's publish of the same version must fail —
    // POSIX rename would silently replace the file, the hardlink
    // commit cannot
    val e = intercept[IllegalStateException] {
      StreamingUpsert.commitManifest(spark, dir, 1,
        Map(0L -> "bucket-0-g2-loser"))
    }
    assert(e.getMessage.contains("second writer"))
    // the winner's manifest content survives byte-for-byte
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/manifest-2")), "UTF-8")
      == "0\tbucket-0-g1", "loser must not clobber the committed manifest")
  }

  test("retention bounds generations per bucket to keepGenerations") {
    val dir = tmpTable()
    for (i <- 1 to 4)
      StreamingUpsert.applyBatch(spark, dir, 2, chg(Seq(
        (0L, i.toLong, "U", s"v$i"))))
    val gens = new java.io.File(dir).listFiles().toSeq.map(_.getName)
      .filter(_.startsWith("bucket-0-g")).sorted
    assert(gens == Seq("bucket-0-g3", "bucket-0-g4"),
      s"only the newest two generations survive, got $gens")
    assert(contents(dir) == Seq((0L, "v4")))
    // vacuumed versions fail loudly on read; the retained one works
    assert(StreamingUpsert.readVersion(spark, dir, 3).get
      .select("payload").collect().map(_.getString(0)).toSeq == Seq("v3"))
  }

  test("manifest GC keeps the newest versions, refuses expired ones loudly, never touches what it cannot parse") {
    val dir = tmpTable()
    for (i <- 1 to 5)
      StreamingUpsert.applyBatch(spark, dir, 2,
        chg(Seq((0L, i.toLong, "U", s"v$i"))), keepGenerations = 5)
    // junk the GC must never interpret as a manifest
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest-abc"),
      "not a version".getBytes("UTF-8"))
    val r = StreamingUpsert.expireManifests(spark, dir, keepVersions = 2)
    assert(r.deleted == Seq(1, 2, 3) && r.kept == Seq(4, 5))
    assert(r.skipped == Seq("manifest-abc"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/manifest-abc")),
      "unparseable names are reported, never deleted")
    // current + kept versions still resolve (generations retained)
    assert(contents(dir) == Seq((0L, "v5")))
    assert(StreamingUpsert.readVersion(spark, dir, 4).get
      .select("payload").collect().map(_.getString(0)).toSeq == Seq("v4"))
    // expired versions refuse loudly — never a partial snapshot
    intercept[java.io.FileNotFoundException] {
      StreamingUpsert.readVersion(spark, dir, 2)
    }
    // idempotent: a re-run is a no-op on the manifest set
    val r2 = StreamingUpsert.expireManifests(spark, dir, keepVersions = 2)
    assert(r2.deleted.isEmpty && r2.kept == Seq(4, 5))
    // the writer is untouched by GC: the next apply commits v6
    StreamingUpsert.applyBatch(spark, dir, 2, chg(Seq((0L, 9L, "U", "v6"))))
    assert(contents(dir) == Seq((0L, "v6")))
  }

  test("a crash mid-GC leaves the current snapshot readable") {
    val dir = tmpTable()
    for (i <- 1 to 4)
      StreamingUpsert.applyBatch(spark, dir, 2,
        chg(Seq((0L, i.toLong, "U", s"v$i"))), keepGenerations = 4)
    // a partial run = deletes proceed oldest-first and stop anywhere;
    // simulate the smallest prefix (only manifest-1 deleted)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/manifest-1"))
    assert(contents(dir) == Seq((0L, "v4")),
      "current snapshot reads fine after a partial GC")
    // and the resumed run completes from where it stopped
    val r = StreamingUpsert.expireManifests(spark, dir, keepVersions = 1)
    assert(r.deleted == Seq(2, 3) && r.kept == Seq(4))
    assert(contents(dir) == Seq((0L, "v4")))
  }

  test("GC on a pre-first-write table is an empty retention state") {
    val r = StreamingUpsert.expireManifests(spark,
      tmpTable(), keepVersions = 3)
    assert(r == StreamingUpsert.ManifestRetention(Nil, Nil, Nil))
  }

  test("keepManifests wires GC into the streaming loop — metadata stays bounded") {
    val sp = spark
    import sp.implicits._
    val dir = tmpTable()
    val ckpt = java.nio.file.Files.createTempDirectory("upsertgc").toString
    val input = MemoryStream[(Long, Long, String, String)](sp)
    val q = StreamingUpsert.start(
      input.toDF.toDF("id", "seq", "op", "payload"), dir, ckpt,
      numBuckets = 2, keepManifests = Some(2),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    for (i <- 1 to 5) {
      input.addData(Seq((0L, i.toLong, "U", s"v$i")))
      q.processAllAvailable()
    }
    q.stop()
    val manifests = new java.io.File(dir).listFiles().toSeq
      .map(_.getName).filter(_.matches("manifest-\\d+")).sorted
    assert(manifests == Seq("manifest-4", "manifest-5"),
      s"GC must keep exactly the 2 newest manifests, got $manifests")
    assert(contents(dir) == Seq((0L, "v5")))
  }

  test("streamed changes maintain the same table the batch fold produces") {
    val sp = spark
    import sp.implicits._
    val dir = tmpTable()
    val ckpt = java.nio.file.Files.createTempDirectory("upsertck").toString
    val input = MemoryStream[(Long, Long, String, String)](sp)
    val q = StreamingUpsert.start(
      input.toDF.toDF("id", "seq", "op", "payload"), dir, ckpt,
      numBuckets = 4,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    input.addData(Seq((1L, 1L, "U", "a"), (2L, 2L, "U", "b")))
    q.processAllAvailable()
    input.addData(Seq((2L, 3L, "U", "b2"), (1L, 4L, "D", ""),
      (3L, 5L, "U", "c")))
    q.processAllAvailable()
    q.stop()
    // batch fold of the same history
    val bdir = tmpTable()
    StreamingUpsert.applyBatch(spark, bdir, 4, chg(Seq(
      (1L, 1L, "U", "a"), (2L, 2L, "U", "b"))))
    StreamingUpsert.applyBatch(spark, bdir, 4, chg(Seq(
      (2L, 3L, "U", "b2"), (1L, 4L, "D", ""), (3L, 5L, "U", "c"))))
    assert(contents(dir) == contents(bdir))
    assert(contents(dir) == Seq((2L, "b2"), (3L, "c")))
  }
}
