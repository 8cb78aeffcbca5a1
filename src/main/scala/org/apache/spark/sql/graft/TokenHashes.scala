package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels replacing the interpreted `transform(...)`
  * higher-order functions on the dedup hot paths. Spark's HOFs
  * (transform/aggregate/zip_with) evaluate their lambda per element in
  * interpreted mode and block whole-stage codegen of the enclosing
  * projection — measurable on every key that hashes each token of every
  * document. Each kernel reproduces the corresponding expression chain
  * BIT-EXACTLY (property-specced against it in KernelPropertySpec):
  *
  *  - [[TokenHashesMod]]  ≡ `transform(toks, t -> pmod(hash(t) :: long, p))`
  *    (murmur3 seed 42 — the MinHash token-hash step)
  *  - [[TokenHashes64]]   ≡ `transform(toks, t -> xxhash64(t))`
  *    (seed 42 — the SimHash token-hash step)
  *  - [[BandBuckets]]     ≡ `transform(sequence(0, bands-1),
  *                             b -> hash(slice(sig, b*rows+1, rows), b))`
  *    (the LSH band-bucket fold: murmur3 over the long slice from seed
  *    42, then the band index folded in — Spark's multi-arg hash())
  */
case class TokenHashesMod(child: Expression, p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes_mod"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.hashMod(input.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenHashes.hashMod($a, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): TokenHashesMod =
    copy(child = newChild)
}

case class TokenHashes64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes64"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.hash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenHashes.hash64($a);")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes64 =
    copy(child = newChild)
}

case class BandBuckets(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "band_buckets"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.bandBuckets(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenHashes.bandBuckets($a, $bands, $rows);")

  override protected def withNewChildInternal(newChild: Expression): BandBuckets =
    copy(child = newChild)
}

object TokenHashes {

  /** murmur3(token, seed 42) as long, pmod p; null token → the seed
    * (exactly `hash(NULL)`'s contract). */
  def hashMod(toks: ArrayData, p: Long): GenericArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h: Long =
        if (toks.isNullAt(i)) 42L
        else {
          val s = toks.getUTF8String(i)
          Murmur3_x86_32.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 42).toLong
        }
      out(i) = ((h % p) + p) % p
      i += 1
    }
    new GenericArrayData(out)
  }

  /** xxhash64(token, seed 42); null token → the seed. */
  def hash64(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (toks.isNullAt(i)) 42L
        else {
          val s = toks.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-band murmur3 fold over the signature slice (seed 42, elements
    * folded in order, band index folded last) — `hash(slice(...), b)`. */
  def bandBuckets(sig: ArrayData, bands: Int, rows: Int): GenericArrayData = {
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = 42
      var i = b * rows
      val end = math.min(i + rows, sig.numElements())
      while (i < end) {
        if (!sig.isNullAt(i)) h = Murmur3_x86_32.hashLong(sig.getLong(i), h)
        i += 1
      }
      out(b) = Murmur3_x86_32.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }
}
