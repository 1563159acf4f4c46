package graft

/** Opt-in per-phase wall-clock accounting for commit-protocol
  * decomposition (round-13 verdict item 5: split the streaming
  * ANN-index twin's ~0.5 s/commit into lock wait / batch write /
  * marker writes / manifest rename / replay-mark read). DISABLED by
  * default — `time` is a zero-allocation passthrough unless a bench
  * harness flips [[enabled]] — so the production paths carry no
  * measurement cost. Accumulates nanos per phase name across threads;
  * a harness snapshots-and-resets between reps. */
object Phases {
  @volatile private[graft] var enabled = false
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  def time[T](name: String)(body: => T): T =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      try body
      finally acc
        .computeIfAbsent(name,
          _ => new java.util.concurrent.atomic.AtomicLong)
        .addAndGet(System.nanoTime() - t0)
    }

  /** Accumulated seconds per phase, clearing the accumulator. */
  def snapshotAndReset(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val out = acc.asScala.map { case (k, v) => k -> v.get() / 1e9 }.toMap
    acc.clear()
    out
  }
}
