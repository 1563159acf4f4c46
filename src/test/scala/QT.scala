// Dev timing harness: times individual queries at sf0.1 with per-rep
// prints (`sbt "Test/runMain QT q55_dup_clusters ..."`, or ALL).
// Deliberately NOT the bench contract — graft.Bench is the driver's
// measured surface; this exists so one slow query can be re-timed
// without the full warm-up + 58-query sweep.
object QT {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.isEmpty || args(0) == "ALL") graft.SparkEntry.queries.keys.toSeq
      else args.toSeq
    if (args.isEmpty || args(0) == "ALL")
      graft.SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        val t0 = System.nanoTime(); fn(spark, d).count()
        val t = (System.nanoTime() - t0) / 1e9
        System.err.println(f"TIMING $name rep$i $t%.2f")
        t
      }
      graft.Caches.release(); spark.catalog.clearCache()
      System.err.println(f"MEDIAN $name ${times.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
