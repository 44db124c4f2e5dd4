package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the EntryCaches contract: a tracked persist is a real Spark
  * cache (plan substitution happens), releaseAll drops exactly the
  * tracked entries, and double-release / post-release use are safe —
  * the mechanism Verify (per query) and Bench (per block) rely on to
  * keep a 201-entry session's storage flat.
  */
class EntryCachesSpec extends AnyFunSuite with SparkTestBase {
  import EntryCaches.TrackedPersist

  private def isCached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE

  test("persistTracked caches; releaseAll uncaches; both idempotent") {
    val df = spark.range(100).toDF("x").filter("x % 7 = 0")
    df.persistTracked()
    df.count()
    assert(isCached(df), "tracked persist must register a real cache")
    EntryCaches.releaseAll()
    assert(!isCached(df), "releaseAll must unpersist tracked frames")
    // registry drained: a second release is a no-op, and the frame
    // still computes correctly after release
    EntryCaches.releaseAll()
    assert(df.count() === 15)
  }

  test("releaseAll leaves untracked caches alone") {
    val tracked = spark.range(50).toDF("a").filter("a > 10")
    val untracked = spark.range(50).toDF("b").filter("b > 20")
    tracked.persistTracked()
    untracked.persist()
    tracked.count(); untracked.count()
    EntryCaches.releaseAll()
    try {
      assert(!isCached(tracked))
      assert(isCached(untracked),
        "releaseAll must not touch caches the application owns")
    } finally untracked.unpersist()
  }
}
