package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the KMV sketch aggregation buffer:
  * the state must be a pure SET function of the inputs — independent
  * of row order, partition layout, and merge order — because the
  * driver oracle rebuilds it relationally and hash-compares. The
  * randomized splits here exercise merge paths the deterministic
  * PipelineSpec examples cannot enumerate.
  */
object KmvProps extends Properties("functions.KmvSketch") {

  private val k = 8
  private val agg = KmvSketch(BoundReference(0, LongType, nullable = true), k)

  private def sketch(xs: Seq[Long]): java.util.TreeSet[java.lang.Long] = {
    val buf = agg.createAggregationBuffer()
    xs.foreach(v => agg.update(buf, new GenericInternalRow(Array[Any](v))))
    buf
  }

  private def state(buf: java.util.TreeSet[java.lang.Long]): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.map(_.longValue()).toSeq
  }

  private val values: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 40L)) // small domain -> frequent duplicates

  property("state == k smallest distinct inputs, sorted") =
    forAll(values) { xs =>
      state(sketch(xs)) == xs.distinct.sorted.take(k)
    }

  property("row order never changes the state") =
    forAll(values) { xs =>
      state(sketch(xs)) == state(sketch(xs.reverse))
    }

  property("any partitioning + merge order reproduces the sequential " +
    "state") = forAll(values, Gen.choose(1, 5)) { (xs, nParts) =>
    val parts = xs.grouped(math.max(xs.length / nParts, 1)).toList
    val partials = parts.map(sketch)
    val mergedLtr = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
    val mergedRtl = partials.reverse.foldLeft(
      agg.createAggregationBuffer())(agg.merge)
    state(mergedLtr) == state(sketch(xs)) &&
      state(mergedRtl) == state(sketch(xs))
  }

  property("serialize/deserialize round-trips the state") =
    forAll(values) { xs =>
      val buf = sketch(xs)
      state(agg.deserialize(agg.serialize(buf))) == state(buf)
    }
}
