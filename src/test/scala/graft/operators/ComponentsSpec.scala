package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins Components.connectedComponents against a sequential union-find
  * on seeded random graphs, and proves the pointer-jump convergence
  * bound on the worst-case shape for plain label propagation (a long
  * chain, diameter = n - 1).
  */
class ComponentsSpec extends AnyFunSuite with SparkTestBase {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Components.connectedComponents(edges.toDF("a", "b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches sequential union-find on seeded random graphs") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val n = 60 + trial * 30
      val edges = (0 until n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      assert(ccOf(edges) === unionFind(n, edges), s"trial $trial")
    }
  }

  test("chain of 200 nodes converges well under maxIter (pointer jumping)") {
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = ccOf(edges, maxIter = 12)
    assert(got.size === 200)
    assert(got.values.toSet === Set(0L))
  }

  test("disjoint cliques keep distinct min-id labels") {
    val cliqueA = for (i <- 0L to 3L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 14L) yield (i, j)
    val got = ccOf(cliqueA ++ cliqueB)
    assert((0L to 4L).forall(got(_) == 0L))
    assert((10L to 14L).forall(got(_) == 10L))
  }
}
