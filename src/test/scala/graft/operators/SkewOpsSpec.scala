package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

class SkewOpsSpec extends AnyFunSuite with SparkTestBase {

  test("salted join == plain join; shuffle keys carry the salt") {
    // events keyed by event_type is the textbook skew shape: 5 keys,
    // tens of thousands of rows each at scale
    val fact = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = fact.select("event_type").distinct()
      .withColumn("weight", length(col("event_type")).cast("double"))
      // forced through the shuffle path: a broadcast would bypass the
      // very exchange the salt is supposed to spread
      .hint("merge")

    val plain = fact.join(dim, Seq("event_type"))
      .select("event_id", "event_type", "value", "weight")
    val salted = SkewOps.saltedJoin(fact, dim, "event_type",
        col("event_id"), salts = 8)
      .select("event_id", "event_type", "value", "weight")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(rows(salted) === rows(plain))

    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"),
      "join must shuffle on (key, salt), not key alone:\n" + p)
    // the dimension side is replicated salts×, once per salt value
    val dimCount = dim.count()
    val replicated = SkewOps.saltedJoin(fact, dim, "event_type",
      col("event_id"), salts = 8)
    assert(replicated.count() === plain.count(),
      "salting must not change the join cardinality")
    assert(dimCount * 8 === dim.withColumn("__salt",
      explode(array((0 until 8).map(i => lit(i.toLong)): _*))).count())
  }

  test("deterministic salt: same row lands in the same bucket on re-run") {
    val fact = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    def buckets() = fact
      .withColumn("__salt", pmod(xxhash64(col("event_id")), lit(8L)))
      .groupBy("__salt").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = buckets()
    val b = buckets()
    assert(a === b, "salt placement must be reproducible")
    assert(a.size > 1, "salts must actually spread the rows")
  }
}
