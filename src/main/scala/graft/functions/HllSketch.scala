package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared constants and the estimate fold for the 64-register
  * HyperLogLog sketch (Flajolet et al. 2007) used by the p82 batch
  * census and its streaming twin [[graft.streaming.StreamingDistinctHll]].
  *
  * Layout: the 60-bit md5 hash ([[HashScheme.h60Spark]]) splits into a
  * 6-bit register index (top bits) and a 54-bit suffix w; the register
  * value is rho = 55 - len(bin(w)) (w = 0 => 55), i.e. one plus the
  * number of leading zero bits of the suffix. Register folds stay in
  * exact int64: an absent register contributes 2^55 to
  * S = sum_j 2^(55 - M_j), total <= 64 * 2^55 = 2^61 — no overflow.
  * The raw estimate alpha_64 * 64^2 * 2^55 / S is ONE double division
  * of exact integers, so Spark and DuckDB produce the identical IEEE
  * double with no libm.
  *
  * The canonical small-range correction (raw <= 2.5m with empty
  * registers -> linear counting m*ln(m/V)) needs a log, which the
  * cross-engine no-libm rule forbids; V takes only 64 values, so the
  * LC estimates are evaluated ONCE into [[LcTable]] and embedded as
  * the same literal array in both engines' plans.
  */
object HllSketch {
  /** Register count m = 64 (6 index bits). */
  val M = 64

  /** 2^54: modulus splitting the 60-bit hash into (bucket, suffix). */
  val SuffixMod = 18014398509481984L

  /** 2^55: the contribution of an absent (rho = 0) register to S. */
  val AbsentTerm = 36028797018963968L

  /** alpha_64 bias constant (Flajolet et al., m = 64). */
  val Alpha = 0.709

  /** Linear-counting threshold 2.5 * m. */
  val LcThreshold = 160.0

  /** Linear-counting estimates m*ln(m/V) for V = 1..64 empty
    * registers, 6-dp fixed — evaluated once here and embedded as the
    * SAME literal array in the Spark plan and the DuckDB oracle, so no
    * engine evaluates ln itself.
    */
  lazy val LcTable: Array[Double] = Array.tabulate(M)(v =>
    java.math.BigDecimal.valueOf(M * math.log(M.toDouble / (v + 1)))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)

  /** Cardinality estimates from a register table carrying `bucket` /
    * `m` columns plus arbitrary grouping keys — the exact-integer fold
    * shared by the per-source census (p82), its streaming twin, and
    * the windowed variant: S stays int64, the raw estimate is one
    * double division, small-range linear counting comes from the
    * precomputed [[LcTable]] (no libm at query time). Output: the key
    * columns + `hll_est`.
    */
  def estimate(registers: DataFrame, keyCols: Seq[String]): DataFrame = {
    val lcLit = LcTable.mkString("array(", ",", ")")
    registers
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(expr("shiftleft(cast(1 as bigint), cast(55 - m as int))"))
          .as("s_present"),
        count(lit(1)).as("present"))
      .withColumn("s_reg",
        col("s_present") + (lit(M.toLong) - col("present")) * lit(AbsentTerm))
      .withColumn("zero_regs", lit(M.toLong) - col("present"))
      .withColumn("raw",
        lit(Alpha) * lit(M * M) * lit(AbsentTerm.toDouble) /
          col("s_reg").cast("double"))
      .select(keyCols.map(col) :+
        when(col("zero_regs") > 0 && col("raw") <= LcThreshold,
          expr(s"element_at($lcLit, cast(zero_regs as int))"))
          .otherwise(round(col("raw"), 6)).as("hll_est"): _*)
  }
}
