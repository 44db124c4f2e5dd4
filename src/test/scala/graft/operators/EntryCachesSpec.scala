package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the CacheRegistry contract on a PRIVATE registry instance (the
  * global EntryCaches object shares the mechanism via inheritance;
  * releasing the global registry here would evict caches other
  * parallel suites' plan pins depend on): a tracked persist is a real
  * Spark cache, releaseAll drops exactly the tracked entries and is
  * idempotent, untracked caches survive, and tracking is strong-ref —
  * a GC between persist and release must not leak the cache.
  */
class EntryCachesSpec extends AnyFunSuite with SparkTestBase {

  private def isCached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != org.apache.spark.storage.StorageLevel.NONE

  test("persist caches; releaseAll uncaches; both idempotent") {
    val reg = new CacheRegistry
    val df = spark.range(100).toDF("x").filter("x % 7 = 0")
    reg.persist(df)
    df.count()
    assert(isCached(df), "tracked persist must register a real cache")
    assert(reg.trackedCount === 1)
    reg.releaseAll()
    assert(!isCached(df), "releaseAll must unpersist tracked frames")
    assert(reg.trackedCount === 0)
    // registry drained: a second release is a no-op, and the frame
    // still computes correctly after release
    reg.releaseAll()
    assert(df.count() === 15)
  }

  test("releaseAll leaves untracked caches alone") {
    val reg = new CacheRegistry
    val tracked = spark.range(50).toDF("a").filter("a > 10")
    val untracked = spark.range(50).toDF("b").filter("b > 20")
    reg.persist(tracked)
    untracked.persist()
    tracked.count(); untracked.count()
    reg.releaseAll()
    try {
      assert(!isCached(tracked))
      assert(isCached(untracked),
        "releaseAll must not touch caches the application owns")
    } finally untracked.unpersist()
  }

  test("tracking survives the caller dropping its reference (strong " +
    "refs: a GC between persist and release must not leak the cache)") {
    val reg = new CacheRegistry
    // the builder-local reference goes out of scope here, as in a real
    // catalog entry; only the registry still points at the Dataset
    def build(): org.apache.spark.sql.DataFrame = {
      val local = spark.range(80).toDF("v").filter("v % 2 = 0")
      reg.persist(local)
      local.count()
      local.groupBy().count()
    }
    val out = build()
    System.gc(); System.gc()
    out.collect()
    assert(reg.trackedCount === 1,
      "registry must hold the frame strongly until release")
    reg.releaseAll()
    assert(reg.trackedCount === 0)
  }
}
