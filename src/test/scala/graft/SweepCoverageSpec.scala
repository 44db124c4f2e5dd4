package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI twin of ScaleSweep's run-time enumeration gates (VERDICT r13
  * #2 — the p28 lesson applied to the sweep itself): the sweep list
  * plus its documented-exclusion maps must cover every bench and
  * budget-top entry, and every declared-cap entry must either time
  * the 100× point or carry a written exclusion. Pinned here so adding
  * a heavy catalog entry fails `sbt test` immediately, not the next
  * time someone happens to run the sweep.
  */
class SweepCoverageSpec extends AnyFunSuite {

  test("sweep list + exclusions cover bench and budget-top; declared " +
    "caps are swept and x100-adjudicated") {
    val errs = ScaleSweep.coverageErrors()
    assert(errs.isEmpty, errs.mkString("\n"))
  }

  test("x100 tier and per-entry caps reference real catalog entries " +
    "(a stale name would silently gate nothing)") {
    val known = queries.Catalog.queries.keySet
    val stale = (ScaleSweep.X100Names ++ ScaleSweep.X100Excluded.keySet ++
      ScaleSweep.Caps.keySet ++ ScaleSweep.Excluded.keySet ++
      ScaleSweep.ExtraSweepNames).filterNot(known)
    assert(stale.isEmpty, s"not in the catalog: $stale")
  }
}
