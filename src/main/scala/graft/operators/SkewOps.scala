package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins whose key distribution has hot
  * keys too large for one task but whose dimension side is too big (or
  * too row-multiplying) to broadcast outright.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when the skew is KNOWN ahead of time (a
  * stopword-like join key, a null-heavy foreign key) or when AQE is off
  * (streaming micro-batches, stateful plans). The salt is derived
  * deterministically from a row-identity column — never `rand()` — so
  * retried/speculated tasks reproduce the same placement and results
  * stay bit-stable.
  */
object SkewOps {

  /** Inner equi-join on `key`, with the fact side's rows spread over
    * `salts` sub-buckets per key and the dimension side replicated
    * `salts`×. Output == the plain inner equi-join on `key` (modulo row
    * order); the shuffle distributes each hot key over `salts`
    * partitions instead of one.
    *
    * Cost model: dimension bytes × `salts` extra shuffle volume buys
    * fact-side parallelism `salts`× on the hottest key — keep `salts`
    * near (hot-key rows / target partition rows), not huge.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factRowId: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(factRowId), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
