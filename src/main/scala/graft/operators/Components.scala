package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the transitive-closure step that turns pairwise near-dup candidates
  * (p03/p04/p05/p18 emit PAIRS) into duplicate CLUSTERS with a
  * deterministic survivor per cluster.
  *
  * Algorithm: iterative min-label propagation with pointer jumping
  * (label(v) <- label(label(v)) each round), the Spark-friendly
  * equivalent of union-find path compression. Propagation alone needs
  * O(diameter) rounds — a chain of n duplicates would need n rounds —
  * but the jump step doubles the distance labels travel per round, so
  * convergence is O(log n) rounds on ANY graph shape. Per round:
  * one join edges⋈labels + groupBy (min over neighbors), one
  * labels⋈labels self-join (the jump), one anti-equality count (the
  * convergence check). At 100 TB: every step shuffles on node
  * id only — no closure materialization (the DuckDB oracle's recursive
  * CTE builds the full reachability set; that is the oracle's job, not
  * the engine's), no driver-side data, and LSH dedup graphs are sparse
  * (bounded candidate fan-out by construction upstream). Labels are
  * node ids throughout, so the result doubles as the survivor choice:
  * cluster id = min doc id in the component.
  *
  * Each round ends in an eager `localCheckpoint` — iterative DataFrame
  * algorithms MUST truncate lineage per round or the logical plan
  * doubles every iteration (plain `persist` caches data but keeps the
  * plan, and by ~iteration 10 even rendering the plan string OOMs the
  * driver). On a real cluster with a checkpoint dir configured,
  * `reliable = true` swaps in fault-tolerant `checkpoint` instead.
  */
object Components {

  /** @param edges two-column DataFrame of undirected edges (ids of any
    *              orderable numeric type; self-loops and duplicates ok)
    * @return (node, label) — one row per node that appears in an edge;
    *         label = min node id reachable from it
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
      reliable: Boolean = false): DataFrame = {
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val sym = cut {
      val e = edges.toDF("a", "b")
      e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    }
    var labels = cut(sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")))
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // min label among self and all neighbors
      val nbr = sym
        .join(labels.select(col("node").as("v"), col("label").as("vlab")), "v")
        .groupBy(col("u").as("node")).agg(min(col("vlab")).as("nmin"))
      val prop = labels.join(nbr, Seq("node"))
        .select(col("node"), least(col("label"), col("nmin")).as("label"))
      // pointer jump: follow the label one more hop (labels always hold
      // node ids, so the lookup join is total). The convergence flag
      // rides the SAME materialized pass — computing it as a separate
      // jumped⋈labels join afterwards costs one extra join + action per
      // round on every consumer (p23/p56/p61/p66/p67/p71 chains)
      val jumped = cut(prop
        .join(prop.select(col("node").as("label"), col("label").as("ll")),
          Seq("label"))
        .join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .select(col("node"), col("ll").as("label"),
          (col("ll") =!= col("old")).as("changed")))
      done = jumped.filter(col("changed")).isEmpty
      labels = jumped.select(col("node"), col("label"))
      iter += 1
    }
    require(done, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
