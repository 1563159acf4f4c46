package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing/plan probe (not part of the driver contract):
  * `runMain graft.Dev <sfDir> <reps> <nameSubstr>[,<nameSubstr>...] [explain]`
  * times each matching SparkEntry query, printing per-rep seconds and
  * (optionally) the formatted physical plan. Mirrors Bench's
  * cache-release discipline so reps measure the same thing the round
  * bench does.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(',').toSeq
    val doExplain = args.length > 3 && args(3) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.contains) }
      .foreach { case (name, fn) =>
        if (doExplain) {
          fn(spark, sfDir).explain("formatted")
          Caches.release(blocking = true); spark.catalog.clearCache()
        }
        if (args.length > 3 && args(3) == "executed") {
          // the FINAL adaptive plan (post-AQE), visible only after an
          // action — and it must be the plan of the QueryExecution
          // that RAN: df.count() builds its OWN QueryExecution
          // (groupBy().count()), so printing df.queryExecution after
          // it would show a never-executed tree with AQE un-finalized
          // (round-12 advice; Probe's SPARK_GRAFT_PROBE_PLAN block is
          // the reference shape)
          val cdf = fn(spark, sfDir).groupBy().count()
          cdf.collect()
          println(cdf.queryExecution.executedPlan.toString)
          Caches.release(blocking = true); spark.catalog.clearCache()
        }
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val c = fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[dev] $name rows=$c rep=$dt%.2fs")
          dt
        }
        Caches.release(blocking = true); spark.catalog.clearCache(); System.gc()
        println(f"[dev] $name min=${times.min}%.2fs med=${times.sorted.apply(times.length / 2)}%.2fs")
      }
    spark.stop()
  }
}
