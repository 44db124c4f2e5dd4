package graft.streaming

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.StreamingAlerts.{Alert, AlertState}

/** Property-based invariants for the alerting state machine: whatever
  * the probability trajectory, alerts are a subset of upward threshold
  * crossings, sequence numbers are dense, and no two alerts violate
  * the cooldown.
  */
object AlertProps extends Properties("streaming.StreamingAlerts") {

  private val threshold = 0.8
  private val cooldown = 30L

  private val trajectory: Gen[List[Double]] =
    Gen.listOf(Gen.oneOf(Gen.chooseNum(0.0, 1.0),
      Gen.oneOf(0.0, 0.5, 0.79, 0.8, 0.81, 1.0)))

  private def run(probs: List[Double]): (Seq[Alert], Seq[Boolean]) = {
    var s = AlertState(false, 0L, 0L)
    val scores = probs.zipWithIndex.map { case (p, i) =>
      AnomalyScore("s", new Timestamp(i * 10000L), 1.0, p)
    }
    val outs = scores.map { p =>
      val prev = s.wasAbove
      val (ns, a) = StreamingAlerts.step(s, p, threshold, cooldown)
      s = ns
      (a, p.prob >= threshold && !prev)
    }
    (outs.flatMap(_._1), outs.map(_._2))
  }

  property("every alert sits on an upward crossing") =
    forAll(trajectory) { probs =>
      val (alerts, crossings) = run(probs)
      val crossingSecs = probs.indices.filter(crossings)
        .map(_ * 10L).toSet
      alerts.forall(a => crossingSecs.contains(a.ts.getTime / 1000))
    }

  property("alert_seq is dense 1..n") = forAll(trajectory) { probs =>
    val (alerts, _) = run(probs)
    alerts.map(_.alert_seq) == (1L to alerts.length.toLong)
  }

  property("no two alerts inside the cooldown window") =
    forAll(trajectory) { probs =>
      val (alerts, _) = run(probs)
      alerts.map(_.ts.getTime / 1000).sliding(2).forall {
        case Seq(a, b) => b >= a + cooldown
        case _ => true
      }
    }

  property("alerts are monotone in the trajectory: clamping probs " +
    "below the threshold can only remove alerts") =
    forAll(trajectory) { probs =>
      val (alerts, _) = run(probs)
      val damped = probs.map(p => if (p >= threshold) threshold - 0.01 else p)
      val (none, _) = run(damped)
      none.isEmpty && alerts.length >= none.length
    }
}
