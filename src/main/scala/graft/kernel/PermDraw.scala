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
  *  - Randomness comes from a 31-bit integer mix over the 31-bit
  *    ring — every product of ring values and 31-bit constants stays
  *    under 2^62, so BOTH engines run plain native 64-bit arithmetic
  *    (no BigInteger, no DuckDB HUGEINT — a 2^63 ring was bit-exact
  *    too but ~14x slower to replay through DuckDB's software 128-bit
  *    path). Shape: linear state + a lowbias32-style multiply-xorshift
  *    finalizer, restricted to 31 bits; draw index `i`:
  *    {{{
  *    z  = (sh mod 2^31 · A + rn·B + p·C + f·D + i·G) mod 2^31
  *    z ^= z >> 16;  z = z·M1 mod 2^31
  *    z ^= z >> 15;  z = z·M2 mod 2^31
  *    z ^= z >> 16
  *    }}}
  *  - The diff test permutes the WHOLE window: position `i` sorts by
  *    the composite `z << 20 | i` — position ties are impossible, so
  *    both engines sort plain 64-bit integers and agree exactly
  *    (31-bit keys collide at ~2e-8 per 10-position draw; a collision
  *    only flips which of two equally-uniform permutations is drawn,
  *    identically on both engines).
  *  - The subset tests (rank, ks) draw a uniform `a`-subset by
  *    FLOYD'S algorithm over the same raw values ([[subsetAt]]) —
  *    O(a) work per permutation instead of the O(n) full key pass,
  *    and small enough to unroll as SQL CASE expressions.
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
  import PermDraw._

  // row-level linear part — all terms reduced mod 2^31 before
  // multiplying, so every product fits native 64-bit on both engines
  private val zRow =
    ((seriesHash & Mask) * A + (rowKey & Mask) * B) & Mask

  /** Per-permutation linear base; hoist out of position loops. */
  def permBase(family: Int, perm: Int): Long =
    (zRow + family.toLong * D + perm.toLong * C) & Mask

  /** The raw 31-bit mixed value at draw index `i` under permutation
    * base `base` (from [[permBase]]) — ~10 integer ops, no
    * allocation.
    */
  def rawAt(base: Long, i: Int): Long = {
    var z = (base + i.toLong * G) & Mask
    z ^= z >>> 16
    z = (z * M1) & Mask
    z ^= z >>> 15
    z = (z * M2) & Mask
    z ^= z >>> 16
    z
  }

  /** The composite SORT key of position `i`: raw value with the
    * position in the low 20 bits. Position of a key `k` is
    * `(k & 0xfffff)`; sorting a permutation's `n` keys ascending
    * yields the permutation (used by the diff test, which permutes
    * the whole vector).
    */
  def keyAt(base: Long, i: Int): Long = {
    require(i < MaxPositions,
      s"PermDraw supports windows up to $MaxPositions positions, " +
        s"got index $i (AnomalyzerConf.validate rejects such windows " +
        "at configuration time)")
    (rawAt(base, i) << 20) | i
  }

  /** Floyd's uniform `a`-subset of positions `[0, n)` into
    * `out(0 until a)` (pick order, unsorted) — O(a) draws, the reason
    * the subset tests (rank, ks) cost O(a) per permutation instead of
    * the O(n) full key sort. Draw index j consumes `rawAt(base, j)
    * mod (j+1)`; a duplicate pick takes j itself (the classic
    * algorithm), which an SQL CASE replays exactly.
    */
  def subsetAt(base: Long, n: Int, a: Int, out: Array[Int]): Unit = {
    var cnt = 0
    var j = n - a
    while (j < n) {
      val r = (rawAt(base, j) % (j + 1)).toInt
      var dup = false
      var t = 0
      while (t < cnt) {
        if (out(t) == r) { dup = true; t = cnt } else t += 1
      }
      out(cnt) = if (dup) j else r
      cnt += 1
      j += 1
    }
  }
}

object PermDraw {
  val RankFamily = 0
  val DiffFamily = 1
  val KsFamily = 2

  /** 2^31 − 1: the working ring is the non-negative 31-bit integers
    * (`x & Mask` == `x mod 2^31` for non-negative x), sized so ring ×
    * constant products stay under 2^62 — native 64-bit arithmetic in
    * both the kernel and DuckDB.
    */
  val Mask: Long = 0x7fffffffL

  // All constants odd and < 2^31 so they read back identically as
  // DuckDB BIGINT literals and keep products in 62 bits.
  val A: Long = 0x2545f491L // series term
  val B: Long = 0x1e3779b9L // row term (golden, truncated)
  val C: Long = 0x05ebca6bL // permutation term
  val D: Long = 0x42b2ae35L // family term
  val G: Long = 0x27d4eb2fL // position term
  val M1: Long = 0x7feb352dL // finalizer multiplier 1 (lowbias32)
  val M2: Long = 0x046ca68bL // finalizer multiplier 2 (lowbias32)

  /** Positions pack into the composite key's low 20 bits (composite =
    * 31-bit mixed value << 20 | pos, 51 bits total) — windows beyond
    * this are rejected by AnomalyzerConf.validate.
    */
  val MaxPositions: Int = 1 << 20

  /** Position encoded in a composite key. */
  @inline def pos(key: Long): Int = (key & 0xfffffL).toInt

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
