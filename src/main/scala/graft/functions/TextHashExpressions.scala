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

/** `minhash_signature(shingles, k)`: the k-permutation MinHash sketch of
  * a shingle set — element i is min over shingles of xxhash64(shingle,
  * seed=i). Jaccard(A,B) is estimated by the fraction of agreeing
  * signature positions; banding the signature gives LSH buckets.
  * Null/empty input → signature of Long.MaxValue entries.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends TokenArrayExpression {
  require(k > 0 && k <= 1024, "minhash k must be in (0, 1024]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        var j = 0
        while (j < k) {
          val h = hash(s, j.toLong)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig) // primitive long[] constructor
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
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

object TextHashFunctions {
  import org.apache.spark.sql.graft.shims.{column, expression}

  def minhash_signature(tokens: Column, k: Int): Column =
    column(MinHashSignature(expression(tokens), k))
  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))
  def rolling_fingerprint(tokens: Column): Column =
    column(RollingFingerprint(expression(tokens)))
}
