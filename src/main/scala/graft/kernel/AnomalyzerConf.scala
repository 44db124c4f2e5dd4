package graft.kernel

/** Detection configuration, mirroring the reference's AnomalyzerConf
  * (/root/reference/anomalyze.go:14-24) with identical defaulting and
  * validation (anomalyze.go:31-90). Unlike the reference, `lowerBound`
  * is an Option — the reference overloads the NA sentinel
  * (math.SmallestNonzeroFloat64, anomalyze.go:10-12) to mean "no lower
  * fence"; we keep [[AnomalyzerConf.NA]] only as a boundary-compat
  * constant.
  *
  * @param delay        suppress output until the buffer holds
  *                     referenceSize+activeSize points (anomalyze.go:146-149)
  * @param sensitivity  magnitude short-circuit floor (anomalyze.go:173-175)
  * @param upperBound   fence upper bound
  * @param lowerBound   fence lower bound; None disables the lower fence
  * @param activeSize   active-window length (required, >= 1)
  * @param nSeasons     reference window = nSeasons * activeSize
  * @param permCount    bootstrap permutation count for diff/rank/ks
  * @param methods      tests to run, in order
  */
final case class AnomalyzerConf(
    delay: Boolean = false,
    sensitivity: Double = 0.0,
    upperBound: Double = 0.0,
    lowerBound: Option[Double] = None,
    activeSize: Int = 0,
    nSeasons: Int = 0,
    permCount: Int = 0,
    methods: Seq[String] = Nil) {
  def referenceSize: Int = nSeasons * activeSize
  def windowSize: Int = referenceSize + activeSize
}

object AnomalyzerConf {

  /** The reference's NA sentinel (Go math.SmallestNonzeroFloat64),
    * kept only for API-boundary compatibility; internal code uses
    * Option/null. Reference: anomalyze.go:10-12.
    */
  val NA: Double = java.lang.Double.MIN_VALUE

  val SupportedMethods: Seq[String] =
    Seq("magnitude", "diff", "highrank", "lowrank", "fence", "ks", "cdf")

  private val MinimumMethods = Seq("magnitude", "ks")
  private val PermutationMethods = Set("highrank", "lowrank", "ks", "diff")

  /** Defaulting + validation, semantics of anomalyze.go:31-90.
    * Returns the normalized conf or an error message.
    */
  def validate(conf: AnomalyzerConf): Either[String, AnomalyzerConf] = {
    var c = conf
    if (c.methods.isEmpty) c = c.copy(methods = MinimumMethods)
    else {
      val bad = c.methods.find(!SupportedMethods.contains(_))
      if (bad.isDefined)
        return Left(s"Unsupported detection method '${bad.get}'")
    }
    if (c.nSeasons == 0) c = c.copy(nSeasons = 4)
    if (c.activeSize < 1)
      return Left("Active window size must be at least of size 1")
    if (c.referenceSize < 4)
      return Left(
        s"The combination of active window (${c.activeSize}) and nseasons " +
          s"(${c.nSeasons}) yields a reference window that is too small " +
          "for analysis. Please increase one or both.")
    if (c.methods.contains("fence")) {
      val lower = c.lowerBound.getOrElse(NA)
      if (c.upperBound == lower)
        return Left("Fence test included with identical bounds on the fences")
      // the reference compares against the NA sentinel too
      // (anomalyze.go:70), so upperBound <= 0 with no lower bound is
      // rejected rather than yielding x/0 probabilities at runtime
      if (c.upperBound < lower)
        return Left(
          s"UpperBound (${c.upperBound}) was lower than the LowerBound ($lower)")
    }
    if (c.methods.exists(PermutationMethods.contains) && c.permCount == 0)
      c = c.copy(permCount = 500)
    // the oracle-replayable draw packs window positions into 20 bits
    // (PermDraw.MaxPositions); reject absurd windows HERE instead of
    // throwing per-row deep inside a Spark task
    if (c.methods.exists(PermutationMethods.contains) &&
      c.windowSize > PermDraw.MaxPositions)
      return Left(
        s"Permutation tests support windows up to ${PermDraw.MaxPositions} " +
          s"points; referenceSize+activeSize = ${c.windowSize}")
    if (c.methods.contains("magnitude") && c.sensitivity == 0.0)
      c = c.copy(sensitivity = 0.1)
    Right(c)
  }

  def validated(conf: AnomalyzerConf): AnomalyzerConf =
    validate(conf).fold(e => throw new IllegalArgumentException(e), identity)
}
