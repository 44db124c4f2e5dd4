package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll



/** ScalaCheck contracts for the a42/a47/StreamingQuantile log2-bucket
  * sketch, independent of Spark: the bucket function against an
  * arbitrary-precision reference, count-mergeability under ANY split,
  * and the ≤2× relative-error bracket against the exact order
  * statistic — the properties the engine-level specs pin on the real
  * corpus, held here over randomized inputs.
  */
object SketchQuantileProps extends Properties("SketchQuantile") {

  private val qs = Seq(50, 90, 99)

  private def sketchOf(xs: List[Long]): Map[Int, Long] =
    xs.groupBy(StreamingQuantile.bucket).map { case (b, v) =>
      b -> v.size.toLong
    }

  property("bucket == floor(log2)+1 via BigInt bitLength; <=0 -> 0") =
    forAll(Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)) { m =>
      val want = if (m <= 0L) 0 else BigInt(m).bitLength
      StreamingQuantile.bucket(m) == want
    }

  private val microGen =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 500000000L))

  property("sketch counts merge across any split") =
    forAll(microGen, Gen.chooseNum(0, 100)) { (xs, cut) =>
      val k = (xs.size * cut / 100).min(xs.size)
      val (a, b) = xs.splitAt(k)
      val (sa, sb) = (sketchOf(a), sketchOf(b))
      val merged = (sa.keySet ++ sb.keySet).map(x =>
        x -> (sa.getOrElse(x, 0L) + sb.getOrElse(x, 0L))).toMap
      merged == sketchOf(xs)
    }

  property("extraction brackets the exact order statistic (gamma=2)") =
    forAll(microGen) { xs =>
      val sorted = xs.sorted
      val outs = StreamingQuantile.extract("s", sketchOf(xs), qs)
      outs.forall { o =>
        val rank = ((o.n * o.q + 99) / 100).toInt
        val exact = sorted(rank - 1)
        if (o.q_bucket == 0L) exact <= 0L
        else o.est_micro <= exact && exact <= o.est_hi_micro &&
          o.est_hi_micro == 2 * o.est_micro - 1
      }
    }

  property("extraction is merge-invariant: sketch(a)+sketch(b) " +
    "extracts exactly like sketch(a++b)") =
    forAll(microGen, microGen) { (a, b) =>
      val (sa, sb) = (sketchOf(a), sketchOf(b))
      val merged = (sa.keySet ++ sb.keySet).map(x =>
        x -> (sa.getOrElse(x, 0L) + sb.getOrElse(x, 0L))).toMap
      StreamingQuantile.extract("s", merged, qs) ==
        StreamingQuantile.extract("s", sketchOf(a ++ b), qs)
    }
}
