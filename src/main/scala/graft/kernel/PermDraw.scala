package graft.kernel

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Cross-engine deterministic permutation source for the bootstrap
  * tests (diff / highrank / lowrank / ks).
  *
  * The reference resamples with Go's unseeded global RNG
  * (/root/reference/algorithms.go:126,189,300), so its p-values are
  * irreproducible by construction. This engine is therefore free to
  * pick ANY uniform permutation draw — and picks one that an external
  * SQL oracle (DuckDB) can replay bit-for-bit, making the bootstrap
  * queries value-checkable instead of rows-only:
  *
  *  - A row evaluation is identified by `(seriesHash, rowKey)`, where
  *    `seriesHash` is [[PermDraw.seriesHash60]] (leading 60 bits of
  *    md5 of the series string — the repo's standard
  *    [[graft.functions.HashScheme]] h60 primitive) and `rowKey` is
  *    the row's 1-based position in its series.
  *  - Permutation `p` of `n` window positions for test family `f`
  *    sorts positions by a per-position key. Keys come in blocks of
  *    five: block `b` is `md5("{seriesHash}:{rowKey}:{p}:{f}:{b}")`
  *    (ASCII decimal renderings), and position `i` takes the 24-bit
  *    integer at hex chars `[6*(i mod 5), 6*(i mod 5)+6)` of block
  *    `i div 5`.
  *  - The sort key is the composite `key24 << 10 | i` — position ties
  *    are impossible, so both engines sort plain 64-bit integers and
  *    agree exactly. (24-bit keys collide at ~3e-6 per 10-position
  *    draw; a collision only flips which of two equally-uniform
  *    permutations is drawn, identically on both engines.)
  *
  * Families keep the tests' draws independent even when one ensemble
  * evaluation runs several of them: rank (shared by highrank AND
  * lowrank — one subset, two comparisons), diff, ks.
  *
  * Thread safety: an instance is confined to one row evaluation (one
  * thread); the expression/streaming/sequential callers each
  * construct their own.
  */
final class PermDraw(val seriesHash: Long, val rowKey: Long) {
  private val md = MessageDigest.getInstance("MD5")
  private val prefix = seriesHash.toString + ":" + rowKey.toString + ":"

  // Composite-key cache, built per (family) on first use for the
  // (permCount, n) of this evaluation — highrank and lowrank (and any
  // repeated family call) reuse it instead of re-hashing.
  private var cachedP = -1
  private var cachedN = -1
  private val fams = new Array[Array[Long]](3)

  private def build(family: Int, permCount: Int, n: Int): Array[Long] = {
    val blocks = (n + 4) / 5
    val out = new Array[Long](permCount * n)
    var p = 0
    while (p < permCount) {
      var b = 0
      while (b < blocks) {
        val s = prefix + p + ":" + family + ":" + b
        val d = md.digest(s.getBytes(StandardCharsets.US_ASCII))
        val hi = math.min(5, n - 5 * b)
        var j = 0
        while (j < hi) {
          val i = 5 * b + j
          val key = ((d(3 * j) & 0xffL) << 16) |
            ((d(3 * j + 1) & 0xffL) << 8) | (d(3 * j + 2) & 0xffL)
          out(p * n + i) = (key << 10) | i
          j += 1
        }
        b += 1
      }
      p += 1
    }
    out
  }

  /** The composite keys for (`family`, `perm`): returns the family's
    * full key array plus the offset of this permutation's `n` keys.
    * Position of a key `k` is `(k & 1023)`; sorting the `n` keys
    * ascending yields the permutation.
    */
  def keys(family: Int, perm: Int, permCount: Int, n: Int): (Array[Long], Int) = {
    require(n <= 1024,
      s"PermDraw supports windows up to 1024 positions, got $n")
    if (cachedP != permCount || cachedN != n) {
      fams(0) = null; fams(1) = null; fams(2) = null
      cachedP = permCount; cachedN = n
    }
    if (fams(family) == null) fams(family) = build(family, permCount, n)
    (fams(family), perm * n)
  }
}

object PermDraw {
  val RankFamily = 0
  val DiffFamily = 1
  val KsFamily = 2

  /** Position encoded in a composite key. */
  @inline def pos(key: Long): Int = (key & 1023L).toInt

  /** Leading 60 bits of md5 of the UTF-8 series string — identical to
    * Spark `conv(substr(md5(s),1,15),16,10)` and DuckDB
    * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`
    * ([[graft.functions.HashScheme]]'s h60 primitive), so batch SQL,
    * streaming state, the sequential facade, and the DuckDB oracle all
    * derive the same per-series identity.
    */
  def seriesHash60(series: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(series.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
