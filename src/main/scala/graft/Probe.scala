package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only stage profiler: runs one registry query N times and dumps
  * per-stage wall time + shuffle volumes for the last run. Not part of
  * the driver contract. Usage: runMain graft.Probe <sfDir> <query> [n]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local()
    // diagnostic knob: compare stage widths with AQE coalescing off
    sys.env.get("SPARK_GRAFT_PROBE_NO_COALESCE").foreach(_ =>
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "false"))
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(90), dur,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten, si.numTasks))
      }
    })
    val q = SparkEntry.queries(name)
    var lastDf: org.apache.spark.sql.DataFrame = null
    // SPARK_GRAFT_PROBE_WARM: keep per-query caches across runs (the
    // bench's reps share them the same way), so the LAST run's stage
    // profile shows the warm path the bench min actually times
    val warm = sys.env.contains("SPARK_GRAFT_PROBE_WARM")
    for (i <- 1 to n) {
      stages.clear()
      if (!warm) Caches.release(blocking = true)
      val t0 = System.nanoTime()
      lastDf = q(spark, dir)
      val cnt = lastDf.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] run $i: $name rows=$cnt time=$sec%.3f s")
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) {
      // the COUNT's own QueryExecution — what the bench actually runs
      // (df.count() re-optimizes with the aggregate on top; the df's
      // executedPlan can differ, e.g. sorts/exchanges eliminated)
      val cdf = lastDf.groupBy().count()
      cdf.collect()
      println(cdf.queryExecution.executedPlan.toString)
    }
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    println("[probe] stages of last run (id, ms, shufRead, shufWrite, tasks, name):")
    stages.asScala.toSeq.sortBy(-_._3).take(25).foreach { case (id, nm, ms, r, w, t) =>
      println(f"[probe]   $id%5d $ms%6d ms  r=${r / 1024}%8d KB w=${w / 1024}%8d KB tasks=$t%3d  $nm")
    }
    spark.stop()
  }
}
