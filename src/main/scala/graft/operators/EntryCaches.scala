package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Entry-scoped cache registry. Catalog entries persist intermediates
  * that are read 2–5 times WITHIN one entry build, but an entry returns
  * a lazy frame — it cannot unpersist before its caller's terminal
  * action without losing the reuse. Left alone, repeated catalog runs
  * in one session (the bench's 6 runs per query, the p90/p94
  * composition pattern re-invoking component entries) accumulate
  * cached RDDs until executor storage evicts under pressure.
  *
  * The contract: entries route every cache through `persistTracked`;
  * the harness (Verify per query, Bench per block, or an embedding
  * application whenever a catalog result has been consumed) calls
  * `releaseAll` to drop exactly the entry-scoped caches — no blast
  * radius on caches the application owns, unlike
  * `spark.catalog.clearCache()`.
  *
  * References are STRONG until released — deliberately. Spark's
  * CacheManager keeps the cached data alive independently of the
  * Dataset wrapper, so a weak reference could be collected while the
  * cache persists, and releaseAll would silently leak exactly the
  * entry it was built to drop. The registry is therefore bounded by
  * the release cadence, which the harness contract guarantees (one
  * entry's caches between releases).
  */
class CacheRegistry {

  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Registered count — observability for leak tests. */
  def trackedCount: Int = tracked.size()

  /** `persist()` + registration for the next [[releaseAll]]. */
  def persist[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    tracked.add(ds)
    ds
  }

  /** Unpersist (non-blocking) every tracked cache and clear the
    * registry. Safe to call at any point between entry invocations;
    * frames already unpersisted elsewhere no-op. Only non-fatal
    * unpersist failures are swallowed: fatal errors (OOM, linkage)
    * propagate rather than masking a dying executor, and an
    * interrupt re-asserts the thread's interrupt status so callers
    * polling the flag still see the cancellation.
    */
  def releaseAll(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      try ds.unpersist(blocking = false)
      catch {
        case ie: InterruptedException =>
          Thread.currentThread().interrupt()
          throw ie
        case scala.util.control.NonFatal(_) => ()
      }
      ds = tracked.poll()
    }
  }
}

/** The process-global registry the catalog entries and harness share.
  * (Tests exercise the mechanism on their own [[CacheRegistry]]
  * instances — releasing the GLOBAL registry mid-suite would evict
  * caches that other parallel suites' plan pins depend on.)
  */
object EntryCaches extends CacheRegistry {

  implicit final class TrackedPersist[T](private val ds: Dataset[T])
      extends AnyVal {
    def persistTracked(): Dataset[T] = EntryCaches.persist(ds)
  }
}
