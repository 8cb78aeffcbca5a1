package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels replacing the interpreted `transform(...)`
  * higher-order functions on the dedup hot paths. Spark's HOFs
  * (transform/aggregate/zip_with) evaluate their lambda per element in
  * interpreted mode and block whole-stage codegen of the enclosing
  * projection — measurable on every key that hashes each token of every
  * document. Contracts (property-specced in KernelPropertySpec):
  *
  *  - [[TokenHashesMod]]  — ENGINE-NEUTRAL polynomial rolling hash per
  *    token: fold over the token's Unicode CODE POINTS,
  *    `h := (h*31 + cp) mod p` from `h = 0` (null token → 0). Chosen
  *    over murmur3 so the whole MinHash chain is reproducible in plain
  *    SQL by any engine (the DuckDB oracle recomputes it with
  *    `list_reduce`); downstream Carter-Wegman permutations are
  *    2-universal over ANY distinct inputs, so the minhash estimate's
  *    guarantees do not depend on this hash being uniform — only
  *    (near-)injective over the corpus vocabulary, which a 31-poly mod
  *    a Mersenne prime is.
  *  - [[TokenHashes64]]   — ENGINE-NEUTRAL 64-bit token hash (the
  *    SimHash token-hash step): wrapping 31-poly over code points,
  *    splitmix64-finished (see [[TokenHashes.hash64]])
  *  - [[BandBuckets]]     — ENGINE-NEUTRAL seeded LCG fold per band:
  *    `acc := band; for v in sig[band*rows ..< band*rows+rows]:
  *    acc := (acc*A + v) mod p` with A = [[TokenHashes.BandMixA]],
  *    p = 2³¹−1 (same SQL-reproducibility rationale; bucket keys only
  *    need to separate unequal band slices, and every candidate is
  *    verified downstream, so a rare extra collision costs work, never
  *    correctness).
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

  /** LCG multiplier of the band-bucket fold (glibc's rand constant —
    * any odd multiplier < 2³¹ works; fixed so both engines agree). */
  val BandMixA = 1103515245L

  /** Engine-neutral token hash: 31-polynomial over the token's Unicode
    * code points, reduced mod p at every step (`h := (h*31 + cp) mod p`
    * from 0). Null/empty token → 0. Matches the DuckDB form
    * `list_reduce(list_transform(generate_series(1, length(t)),
    * i -> unicode(substr(t, i, 1))), (a, c) -> (a*31 + c) % p)` —
    * list_reduce seeds with the first element, and (0*31 + c₁) = c₁,
    * so the implicit seed agrees with folding from 0. */
  def polyHash(s: UTF8String, p: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % p
      i += Character.charCount(cp)
    }
    h
  }

  /** [[polyHash]] per token (see class doc for the contract/rationale). */
  def hashMod(toks: ArrayData, p: Long): GenericArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (toks.isNullAt(i)) 0L else polyHash(toks.getUTF8String(i), p)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Engine-neutral 64-bit token hash: 31-polynomial over the token's
    * Unicode code points with WRAPPING Long arithmetic (≡ mod 2⁶⁴ on the
    * unsigned interpretation — what any engine's 128-bit `% 2^64` path
    * reproduces), finished with the splitmix64 mixer so every output bit
    * is unbiased — SimHash's per-bit votes need uniform bits, which a
    * bare polynomial does not provide for short tokens. Null token → the
    * mix of 0. Chosen over xxhash64 so the SimHash fingerprint chain is
    * reproducible in plain SQL (the DuckDB oracle recomputes it via
    * HUGEINT mod-2⁶⁴ arithmetic). */
  def hash64(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (toks.isNullAt(i)) mix64(0L) else {
        val str = toks.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < str.length) {
          val cp = str.codePointAt(j)
          h = h * 31L + cp // wrapping = mod 2^64
          j += Character.charCount(cp)
        }
        mix64(h)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** splitmix64 finalizer (Steele/Lea/Flood, public domain constants). */
  def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-band engine-neutral LCG fold over the signature slice:
    * `acc := b; acc := (acc*BandMixA + v) mod 2³¹−1` per element in
    * order. Values stay in [0, 2³¹−1) so the int output never wraps.
    * Matches the DuckDB form `list_reduce([b] || sig[slice],
    * (a, v) -> (a*A + v) % p)` (the prepended band index is the seed). */
  def bandBuckets(sig: ArrayData, bands: Int, rows: Int): GenericArrayData = {
    val p = 2147483647L
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var i = b * rows
      val end = math.min(i + rows, sig.numElements())
      while (i < end) {
        if (!sig.isNullAt(i)) h = (h * BandMixA + sig.getLong(i)) % p
        i += 1
      }
      out(b) = h.toInt
      b += 1
    }
    new GenericArrayData(out)
  }
}
