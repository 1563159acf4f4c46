package graft.llmdata

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** Invariants of the layout-maintenance operators that the DuckDB
  * oracle gate cannot see: zone-map soundness and clustering dominance
  * for q187, and the bin-packing guarantees q188's scaladoc claims.
  */
class LayoutSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q187: zone maps are sound and Z-order dominates insert order") {
    val rows = SparkEntry.queries("q187_zorder_prune")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (zF, zHit, zScan, zMatch) = rows("zorder")
    val (iF, iHit, iScan, iMatch) = rows("insert_order")
    // soundness: a zone-map prune may over-read, never under-read —
    // every true match sits in a hit file under BOTH layouts
    assert(zScan >= zMatch && iScan >= iMatch)
    assert(zMatch == iMatch) // same predicate, same data
    assert(zHit <= zF && iHit <= iF)
    // the point of the rewrite: the clustered layout reads strictly
    // fewer rows for the 2-D box than the ingest layout (the audit's
    // decision signal; on the fixture the gap is large)
    assert(zScan < iScan,
      s"z-order scanned $zScan rows vs insert-order $iScan")
    assert(zHit < iHit)
  }

  test("q187: the 4-bit Morton code is a bijection on the 16x16 grid") {
    // 256 tiles -> 256 distinct file ids, each in [0, 256): the
    // interleave loses nothing, so tile locality is file locality
    import spark.implicits._
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
      .toDF("zx", "zy")
    val morton = grid.selectExpr(
      (0 until 4).map { i =>
        val p = 1L << i
        s"(((zx div $p) % 2) * ${1L << (2 * i)}" +
          s" + ((zy div $p) % 2) * ${1L << (2 * i + 1)})"
      }.mkString("(", " + ", ") as f"))
    val fs = morton.select("f").as[Long].collect()
    assert(fs.distinct.length == 256 && fs.forall(f => f >= 0 && f < 256))
  }

  test("q188: bins conserve rows and fill to target minus max file") {
    val bins = SparkEntry.queries("q188_compaction_plan")(spark, sf)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perFile = graft.Tables.events(spark, sf)
      .groupBy(col("ts").cast("date"), col("event_type"))
      .agg(count(lit(1)).as("n")).agg(sum("n"), max("n"), count(lit(1)))
      .collect()(0)
    val (total, maxFile, nFiles) =
      (perFile.getLong(0), perFile.getLong(1), perFile.getLong(2))
    // conservation: every input file lands in exactly one bin
    assert(bins.map(_._3).sum == total)
    assert(bins.map(_._2).sum == nFiles)
    val target = total / 24 + 1
    // the sorted-greedy guarantee the scaladoc claims: every non-last
    // bin holds >= target - max_file_size rows (cumsum contiguity:
    // a bin's first file overhangs by less than its predecessor's
    // size, and files are sorted descending)
    bins.dropRight(1).foreach { case (b, _, rt, _) =>
      assert(rt >= target - maxFile, s"bin $b: $rt < $target-$maxFile")
    }
    // and no bin silently merges past a full extra target
    bins.foreach { case (b, _, rt, rmax) =>
      assert(rt < target + rmax, s"bin $b overfull: $rt")
    }
  }

  test("q188 shape: an oversized file overflows into its own bin") {
    // synthetic file table: one 100-row whale + ten 5-row files,
    // target 30 -> the whale spans starts [0,100) alone (bins 0..3 of
    // the cumsum all map to it); no small file shares its bins
    import spark.implicits._
    val files = (("whale", 100L) +: (1 to 10).map(i => (s"f$i", 5L)))
      .toDF("name", "n_rows")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col("name"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val t = 30L
    val binned = files
      .withColumn("start", coalesce(sum("n_rows").over(w), lit(0L)))
      .select(col("name"), expr(s"start div $t").as("bin"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(binned("whale") == 0L)
    assert(binned.filter(_._1 != "whale").values.forall(_ > 0L),
      "no small file may share the whale's bin")
  }
}
