package graft.queries

/** The ONE sequential generalized-ESD reference implementation shared
  * by EsdSpec and EsdProps — kept out of both so the two pins cannot
  * silently drift apart. Mirrors the documented a36 semantics: integer
  * sums, 128-bit variance numerator, max |n·x − sx| deviation, FIRST
  * index on ties, rounds by integer subtraction. A degenerate round
  * (varnum = 0) yields NaN for its statistic — the fold emits NULL
  * there and the production filter drops the row either way.
  */
private[queries] object EsdTestRef {

  /** @return (r1..rk, allRoundsNonConstant) for one full window. */
  def esdRef(win0: Array[Long], w: Int, k: Int): (Seq[Double], Boolean) = {
    var arr = win0.toVector
    var sx = arr.map(BigInt(_)).sum
    var sxx = arr.map(v => BigInt(v) * v).sum
    var ok = true
    val rs = (1 to k).map { r =>
      val n = w - (r - 1)
      val varnum = n * sxx - sx * sx
      if (varnum == 0) ok = false
      val devs = arr.map(x => (BigInt(n) * x - sx).abs)
      val maxdev = devs.max
      val idx = devs.indexOf(maxdev) // first index on ties
      val rr =
        if (varnum == 0) Double.NaN
        else maxdev.toDouble / n.toDouble /
          math.sqrt(varnum.toDouble / (n * (n - 1)).toDouble)
      val rm = arr(idx)
      arr = arr.patch(idx, Nil, 1)
      sx -= rm
      sxx -= BigInt(rm) * rm
      rr
    }
    (rs, ok)
  }
}
