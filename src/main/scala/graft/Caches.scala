package graft

import org.apache.spark.sql.Dataset

/** Tracked `persist()` for intermediates embedded in library plans.
  *
  * Several queries persist a DataFrame their plan consumes more than
  * once (q28/q29's token sets, q52's normalized corpus). Spark's
  * CacheManager holds STRONG references until an explicit unpersist —
  * the ContextCleaner never frees DataFrame caches — so a library
  * caller that embeds these plans would otherwise accumulate executor
  * storage across invocations with no way to release it short of the
  * session-wide `spark.catalog.clearCache()` (which also evicts the
  * caller's own caches).
  *
  * Every internal persist goes through [[persist]], which registers
  * the handle; [[release]] unpersists everything tracked so far.
  * The harness mains call it per query; an embedding application
  * calls it whenever the last action over these plans has run.
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** `ds.persist()` + track the handle for a later [[release]]. */
  def persist[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    tracked.add(ds)
    ds
  }

  /** Unpersist every tracked cache (idempotent; safe if some were
    * already unpersisted or their session is stopped). */
  def release(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      try ds.unpersist(blocking = false)
      catch { case _: Throwable => () }
      ds = tracked.poll()
    }
  }
}
