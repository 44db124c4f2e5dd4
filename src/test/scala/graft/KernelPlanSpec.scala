package graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.queries.Catalog

/** Standing gate for the round-10 native-kernel campaign: each entry
  * that replaced an interpreted higher-order-function lambda kernel
  * with a native Catalyst expression must still PLAN with that
  * expression. A regression back to the lambda form would keep the
  * answers bit-identical (the parity pins guarantee that) while
  * silently reintroducing the ~1 ms/row interpreted cost that
  * dominated these entries' wall time — a plan property, so it gets a
  * plan pin (the ScalePropertiesSpec discipline).
  */
class KernelPlanSpec extends AnyFunSuite with SparkTestBase {

  private val pinDir = "/root/testdata/sf0.001"

  /** All expressions anywhere in the analyzed plan, including nested
    * subexpressions.
    */
  private def planHas(name: String, pred: Expression => Boolean): Boolean = {
    val plan = Catalog.queries(name)(spark, pinDir).queryExecution.analyzed
    var found = false
    plan.foreach { node =>
      node.expressions.foreach { e =>
        e.foreach { sub => if (pred(sub)) found = true }
      }
    }
    found
  }

  private val pins: Seq[(String, String, Expression => Boolean)] = Seq(
    ("a29_mann_kendall", "MannKendallStats",
      { case _: MannKendallStats => true; case _ => false }),
    ("a30_theil_sen", "TheilSenMedianSlope",
      { case _: TheilSenMedianSlope => true; case _ => false }),
    ("a10_anomaly_ks_stat", "KsGridStatNum",
      { case _: KsGridStatNum => true; case _ => false }),
    ("a09_anomaly_rank_stats", "DoubleRankSum",
      { case _: DoubleRankSum => true; case _ => false }),
    ("a52_discord_profile", "ScaledL1Dist",
      { case _: ScaledL1Dist => true; case _ => false }),
    ("a53_motif_pairs", "ScaledL1Dist",
      { case _: ScaledL1Dist => true; case _ => false }),
    ("p04_dedup_minhash_lsh", "IntEqCount",
      { case _: IntEqCount => true; case _ => false }),
    ("p08_sim_ann_lsh", "RademacherLshBucket",
      { case _: RademacherLshBucket => true; case _ => false }),
    ("p15_sim_ivf", "IntSqL2",
      { case _: IntSqL2 => true; case _ => false }),
    ("p26_sim_topk_int8", "IntDot",
      { case _: IntDot => true; case _ => false }),
    ("p35_semdedup", "IntSqL2",
      { case _: IntSqL2 => true; case _ => false }),
    ("p55_kmeans_refine", "IntSqL2",
      { case _: IntSqL2 => true; case _ => false }),
    ("p59_pq_topk", "IntDot",
      { case _: IntDot => true; case _ => false }),
    ("p63_sim_ivfpq", "IntSqL2",
      { case _: IntSqL2 => true; case _ => false }),
    ("p76_coreset_kcenter", "IntSqL2",
      { case _: IntSqL2 => true; case _ => false }),
    ("p81_contam_semantic", "IntSqL2",
      { case _: IntSqL2 => true; case _ => false }),
    ("p58_bm25_topk", "Bm25Contrib",
      { case _: Bm25Contrib => true; case _ => false }),
    ("p60_hybrid_rrf", "Bm25Contrib",
      { case _: Bm25Contrib => true; case _ => false }),
    ("p06_embed_neardup", "DoubleDot",
      { case _: DoubleDot => true; case _ => false }),
    ("a54_detector_scorecard", "RobustWindowStats",
      { case _: RobustWindowStats => true; case _ => false }),
    ("a57_ensemble_ablation", "RobustWindowStats",
      { case _: RobustWindowStats => true; case _ => false }),
    ("a17_cusum_shift", "CusumMaxAbs",
      { case _: CusumMaxAbs => true; case _ => false }),
    ("a19_rolling_median", "RobustWindowStats",
      { case _: RobustWindowStats => true; case _ => false }),
    ("a20_mad_zscore", "RobustWindowStats",
      { case _: RobustWindowStats => true; case _ => false }),
    ("a21_iqr_fence", "RobustWindowStats",
      { case _: RobustWindowStats => true; case _ => false }),
    ("p36_winnowing", "WinnowFingerprints",
      { case _: WinnowFingerprints => true; case _ => false }))

  test("every kernel-converted entry plans with its native expression") {
    val missing = pins.collect {
      case (entry, expr, pred) if !planHas(entry, pred) => s"$entry -> $expr"
    }
    assert(missing.isEmpty,
      s"entries planning WITHOUT their native kernel: $missing")
  }

  test("p06 joins with the cheap ineq conjunct BEFORE the threshold") {
    // the r11 A/B: written as a filter, the cosine threshold is pushed
    // into the nested-loop join condition IN FRONT of vec_a < vec_b,
    // doubling the kernel calls (4M ordered pairs instead of 2M). Pin
    // the evaluation order of the shipped form: the leftmost conjunct
    // of the join condition must be the id inequality.
    import org.apache.spark.sql.catalyst.expressions.{And, LessThan}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val plan = Catalog.queries("p06_embed_neardup")(spark, pinDir)
      .queryExecution.sparkPlan
    val conds = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j.condition
    }.flatten
    assert(conds.nonEmpty, "p06 no longer plans a nested-loop join")
    conds.foreach {
      case And(l, _) =>
        assert(l.isInstanceOf[LessThan],
          s"p06 join condition leads with ${l.prettyName}, not the " +
            "cheap vec_a < vec_b conjunct — the pushed-threshold " +
            "pathology is back")
      case other => fail(s"p06 join condition is not a conjunction: $other")
    }
  }

  test("p55 cuts centroid lineage per Lloyd round") {
    // without the per-iteration localCheckpoint the final action
    // replans/reexecutes the whole 3-round trajectory (3.2 -> 1.45 s
    // at sf0.1); the analyzed plan must read the checkpointed RDD
    import org.apache.spark.sql.execution.LogicalRDD
    val plan = Catalog.queries("p55_kmeans_refine")(spark, pinDir)
      .queryExecution.analyzed
    val rdds = plan.collect { case r: LogicalRDD => r }
    assert(rdds.nonEmpty,
      "p55 plans with no LogicalRDD — the per-round lineage cut is gone")
  }

  test("the pin predicate is not vacuous") {
    // q01_agg is a plain scan+agg — none of the kernels may appear
    val kernelish: Expression => Boolean = {
      case _: MannKendallStats | _: TheilSenMedianSlope |
           _: KsGridStatNum | _: DoubleRankSum | _: ScaledL1Dist |
           _: IntSqL2 | _: IntDot | _: IntEqCount |
           _: RademacherLshBucket => true
      case _ => false
    }
    assert(!planHas("q01_agg", kernelish),
      "q01_agg unexpectedly contains a series kernel — the pin " +
        "predicate lost its discriminating power")
  }
}
