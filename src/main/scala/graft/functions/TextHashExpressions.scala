package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for content-defined hashing — the
  * primitives behind near-duplicate detection at scale (MinHash-LSH,
  * SimHash, content fingerprints). Implemented as native expressions
  * (not UDFs) so they compose with Catalyst planning; all hashing is
  * xxHash64, seeded, fully deterministic.
  */
abstract class TokenArrayExpression extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  protected def hash(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}

/** `minhash_signature(tokens, ngram, k)`: the k-permutation MinHash
  * sketch of the document's word-n-gram shingle set, computed without
  * materializing shingle strings: each token is xxhash64'd once, each
  * n-gram combines its token hashes with a polynomial roll, and the k
  * "permutations" are splitmix64 finalizations of the n-gram hash
  * seeded per position (the standard h_i(x) = mix(x ^ seed_i) scheme).
  * Jaccard(A,B) is estimated by the fraction of agreeing signature
  * positions; banding the signature gives LSH buckets. Duplicate
  * shingles don't affect the min, so set semantics come free.
  * Documents shorter than one n-gram yield Long.MaxValue entries.
  */
case class MinHashSignature(child: Expression, ngram: Int, k: Int)
    extends TokenArrayExpression {
  require(k > 0 && k <= 1024, "minhash k must be in (0, 1024]")
  require(ngram > 0, "ngram must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // per-permutation xor-seeds, fixed by construction
  private lazy val seeds: Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = MinHashSignature.mix64(0x9e3779b97f4a7c15L * (i + 1)); i += 1 }
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    if (n >= ngram) {
      // token hashes, one byte-level pass per token
      val th = new Array[Long](n)
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        th(i) = if (s == null) 0L else hash(s, 0L)
        i += 1
      }
      var j = 0
      while (j <= n - ngram) {
        var sh = 1125899906842597L
        var m = 0
        while (m < ngram) { sh = sh * 31L + th(j + m); m += 1 }
        var p = 0
        while (p < k) {
          val h = MinHashSignature.mix64(sh ^ seeds(p))
          if (h < sig(p)) sig(p) = h
          p += 1
        }
        j += 1
      }
    }
    new GenericArrayData(sig) // primitive long[] constructor
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** `simhash64(tokens)`: 64-bit SimHash — per-bit majority vote over the
  * xxhash64 of each token. Near-duplicate documents differ in a few
  * bits (compare via hamming distance / segment blocking).
  */
case class SimHash64(child: Expression) extends TokenArrayExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = hash(s, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `rolling_fingerprint(tokens)`: order-sensitive polynomial rolling
  * hash (base 31, wrapping 64-bit) over token hashes — a cheap
  * order-aware document fingerprint, unlike the set-based MinHash.
  */
case class RollingFingerprint(child: Expression) extends TokenArrayExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var h = 1125899906842597L // large prime start
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val th = if (s == null) 0L else hash(s, 0L)
      h = h * 31L + th // deliberate wrapping arithmetic
      i += 1
    }
    h
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ngram_hashes(tokens, n)`: 64-bit hashes of the word n-grams, one
  * pass, no shingle-string materialization — each token is xxhash64'd
  * once and each n-gram combines its token hashes with a polynomial
  * roll (same combine as [[MinHashSignature]]). For join-based set
  * operations (exact Jaccard, candidate generation) the hash IS the
  * shingle identity: 64 bits make collisions negligible (~1e-9 at
  * millions of shingles) and the shuffle moves 8-byte keys instead of
  * ~30-byte strings.
  */
case class NGramHashes(child: Expression, n: Int) extends TokenArrayExpression {
  require(n > 0, "ngram size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val s = arr.getUTF8String(i)
      th(i) = if (s == null) 0L else hash(s, 0L)
      i += 1
    }
    val out = new Array[Long](cnt - n + 1)
    var j = 0
    while (j <= cnt - n) {
      var sh = 1125899906842597L
      var m = 0
      while (m < n) { sh = sh * 31L + th(j + m); m += 1 }
      out(j) = sh
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `word_ngrams(tokens, n)`: space-joined word n-grams in one pass —
  * output-identical to `transform(sequence(...), i -> concat_ws(" ",
  * slice(tokens, i+1, n)))` but ~10x cheaper: the HOF chain re-slices
  * and re-copies per shingle (and can't share the tokenization across
  * lambda scopes), while this builds each shingle directly from the
  * token array. Shorter-than-n input yields an empty array.
  */
case class WordNGrams(child: Expression, n: Int) extends TokenArrayExpression {
  require(n > 0, "ngram size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](cnt - n + 1)
    var j = 0
    while (j <= cnt - n) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, j, parts, 0, n)
      out(j) = UTF8String.concatWs(sep, parts: _*)
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `md5_minhash(shingles)`: the [[HashScheme]] MinHash signature —
  * per-shingle 32-bit md5 base hash, then the k affine permutations —
  * in one tight pass. Output-identical to the compositional SQL
  * formulation (`transform(sequence(0,k-1), i -> array_min(...))` over
  * `conv(substr(md5(g),1,8),16,10)`) that the DuckDB oracle runs, but
  * ~an order of magnitude cheaper: one digest per shingle, no hex
  * string materialization, no per-(i,shingle) lambda dispatch.
  */
case class Md5MinHash(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    import HashScheme.{minhashA => A, minhashB => B, MinHashK => k, MinHashP => P}
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(P)
    val md = Md5MinHash.digest.get()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        // first 4 digest bytes big-endian == first 8 hex chars of md5
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var i = 0
        while (i < k) {
          val v = (A(i) * h + B(i)) % P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Md5MinHash {
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** `md5_h60_ngrams(tokens, n)`: the [[HashScheme]] 60-bit md5 hash of
  * each space-joined word n-gram — the array the winnowing /
  * fingerprint pipelines fold over. Output-identical to the SQL
  * `transform(sequence(1, size-n+1), i ->
  * conv(substr(md5(concat_ws(' ', slice(tokens, i, n))), 1, 15), 16,
  * 10))` form the DuckDB oracles run, but one digest per gram with
  * byte-level concat and no hex materialization. Shorter-than-n input
  * yields an empty array (the SQL form's `CASE len >= n` guard).
  */
case class Md5H60NGrams(child: Expression, n: Int)
    extends TokenArrayExpression {
  require(n > 0, "ngram size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_h60_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val md = Md5MinHash.digest.get()
    val out = new Array[Long](cnt - n + 1)
    var j = 0
    while (j <= cnt - n) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, j, parts, 0, n)
      md.reset()
      val d = md.digest(UTF8String.concatWs(sep, parts: _*).getBytes)
      // first 15 hex chars == first 8 digest bytes big-endian >>> 4
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out(j) = h >>> 4
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `md5_simhash60(tokens)`: the [[HashScheme]] 60-bit SimHash — per
  * token the md5-60 base hash (first 15 hex chars), each occurrence
  * voting ±1 into 60 bit-counters, majority (>0) folding to the
  * signature. Output-identical to the SQL token-fold the DuckDB oracle
  * runs (and that `Pipeline.simhashSql` used to run Spark-side), but
  * one digest per token with no hex-string materialization and no
  * per-(bit, token) lambda dispatch — the same ~10x the Md5MinHash
  * native form bought the MinHash pipeline.
  */
case class Md5SimHash60(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash60"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](60)
    val md = Md5MinHash.digest.get()
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        md.reset()
        val d = md.digest(s.getBytes)
        // first 15 hex chars == first 8 digest bytes big-endian >>> 4
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h >>>= 4
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) cnt(i) += 1 else cnt(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 60) { if (cnt(i) > 0) sig |= 1L << i; i += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextHashFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  def minhash_signature(tokens: Column, ngram: Int, k: Int): Column =
    column(MinHashSignature(expression(tokens), ngram, k))
  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))
  def rolling_fingerprint(tokens: Column): Column =
    column(RollingFingerprint(expression(tokens)))
  def word_ngrams(tokens: Column, n: Int): Column =
    column(WordNGrams(expression(tokens), n))
  def md5_minhash(shingles: Column): Column =
    column(Md5MinHash(expression(shingles)))
  def md5_simhash60(tokens: Column): Column =
    column(Md5SimHash60(expression(tokens)))
  def md5_h60_ngrams(tokens: Column, n: Int): Column =
    column(Md5H60NGrams(expression(tokens), n))
  def ngram_hashes(tokens: Column, n: Int): Column =
    column(NGramHashes(expression(tokens), n))
}
