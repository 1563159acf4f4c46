package graft

/** Dev-only: print the registry's query names, one per line (consumed
  * by tools/bench_sf1.py to plan its chunked fresh-JVM runs). */
object Names {
  def main(args: Array[String]): Unit =
    SparkEntry.registry.map(_.name).foreach(println)
}
