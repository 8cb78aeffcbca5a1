package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DecimalType, DoubleType, FloatType, IntegerType}

/** Native kernels for the EXACT-decimal dot product (VectorMath.dotDec's
  * former interpreted chain):
  *
  *   aggregate(
  *     zip_with(a, b, (x, y) -> x::double::dec(9,7) * y::double::dec(9,7)),
  *     0::dec(28,14), (acc, x) -> (acc + x)::dec(28,14))
  *
  * The chain's semantics reduce to integer arithmetic: a dec(9,7) value
  * is an unscaled long in [-999999999, 999999999], the dec(19,14)
  * element product of two such longs is their exact 128-bit-free product
  * (≤ 999999999² < 2⁶³), and the dec(28,14) sum accumulates those
  * products at the shared scale 14. So the split is:
  *
  *  - [[DecimalQuantize7]] ≡ `transform(a, x -> x::double::dec(9,7))` as
  *    scale-7 unscaled INTS (|unscaled| ≤ 999999999 < 2³¹, so the
  *    quantized array costs the same bytes as the float vector it
  *    replaces in the verify joins), computed ONCE per vector (null element
  *    where the cast yields null: NaN/±Inf/|x| ≥ 100). The per-element
  *    shortest-decimal conversion (Double.toString semantics — what
  *    Spark's double→decimal cast does) is the expensive part of the
  *    chain; quantizing per VECTOR instead of per PAIR amortizes it
  *    across the O(pairs) verify joins.
  *  - [[QuantizedDot14]] — the per-pair kernel: a pure primitive long
  *    loop (multiply + addExact), returning dec(28,14). Null exactly
  *    when the chain is null: either array null, any element null up to
  *    the LONGER length (zip_with pads the shorter side with nulls, and
  *    a null product nullifies the whole aggregate), or the dec(28,14)
  *    precision check failing. Sums that overflow the scale-14 long
  *    range (|Σ| > 92233.72…, unreachable for unit-norm embeddings)
  *    fall back to the exact BigDecimal replication of the chain.
  *
  * Bit-identity with the interpreted chain — including the null contract,
  * rounding midpoints, -0.0f, and the overflow fallback — is
  * property-specced in KernelPropertySpec, so every oracle-checked
  * consumer (sim_topk, dd_embedding, dd_embedding_exact) stays bit-exact.
  *
  * One deliberate divergence: the kernels implement the TOTAL (non-ANSI)
  * cast semantics — NaN/±Inf/|x| ≥ 100 quantize to null — where the
  * chain under Spark 4's ANSI default would THROW. A dedup/similarity
  * scan over a 100-TB corpus should skip a malformed vector, not abort
  * the job; in-range values (every real embedding) are bit-identical
  * either way.
  */
object DecimalDot {

  private val MaxUnscaled7 = 999999999L // dec(9,7): 9 digits

  /** Scale-7 unscaled int of one float under the chain's cast semantics,
    * or null (boxed) where the cast is null. */
  private def quantize1(f: Float): java.lang.Integer = {
    val d = f.toDouble
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
    // Spark's Cast(double → decimal) goes through the double's shortest
    // decimal form (BigDecimal.valueOf == Double.toString), then rounds
    // HALF_UP to the target scale and null-overflows past the precision
    val q = java.math.BigDecimal.valueOf(d)
      .setScale(7, java.math.RoundingMode.HALF_UP)
    val u = q.unscaledValue()
    if (u.bitLength() > 63) return null
    val l = u.longValue()
    if (l > MaxUnscaled7 || l < -MaxUnscaled7) null
    else java.lang.Integer.valueOf(l.toInt)
  }

  /** transform-equivalent over a float array; null elements stay null. */
  def quantize7(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (a.isNullAt(i)) null else quantize1(a.getFloat(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact dec(28,14) dot of two quantized arrays, or null per the
    * chain's null contract. Returns a boxed Decimal or null. */
  def dot14(a: ArrayData, b: ArrayData): org.apache.spark.sql.types.Decimal = {
    val la = a.numElements()
    val lb = b.numElements()
    val n = math.max(la, lb)
    // zip_with pads the shorter side with null ⇒ null product ⇒ the
    // aggregate goes null at that step and stays null
    if (la != lb) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getInt(i).toLong * b.getInt(i).toLong // |q| ≤ 1e9 ⇒ exact
      try sum = Math.addExact(sum, p)
      catch { case _: ArithmeticException => return dot14Slow(a, b) }
      i += 1
    }
    // the chain's per-step (28,14) cast nulls at |unscaled| ≥ 10^28 —
    // beyond the long range, so inside the fast path it cannot trigger
    org.apache.spark.sql.types.Decimal(sum, 28, 14)
  }

  /** Exact replication of the chain for sums past the long range: per-step
    * add at scale 14 with the dec(28,14) precision check (null on
    * overflow — matching the non-ANSI cast). Re-checks element nulls from
    * the start: the fast path only vetted the prefix it accumulated
    * before overflowing, and a null AFTER the overflow point must still
    * null the whole result (reading a null slot would fabricate a
    * value). */
  /** Fused pair-verify cosine: the EXACT [[dot14]] value converted to
    * double exactly as `Decimal(28,14).cast(double)` would, divided by
    * the two PRECOMPUTED per-vector sqrt-norm doubles. Bit-identical to
    * `cosineFromDec(quantizedDot(qa, qb), na, nb)` with
    * `sqrt(na.cast(double))` hoisted out of the pair loop — but with NO
    * per-pair Decimal/BigDecimal allocation on the fast path, which at
    * candidate volumes of 10⁷+/scan is the verify stage's cost.
    *
    * Double-conversion exactness: when |Σ| ≤ 2⁵³ both the unscaled sum
    * and 10¹⁴ are exact doubles, so ONE correctly-rounded IEEE division
    * equals BigDecimal(Σ, 14).doubleValue (what Decimal.toDouble runs);
    * past 2⁵³ the BigDecimal form is used directly. Null exactly when
    * [[dot14]] is null (the filter then drops the pair, as it dropped
    * the null cosine before). */
  def cosine14(a: ArrayData, b: ArrayData, sa: Double, sb: Double): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    if (la != lb) return null
    var sum = 0L
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getInt(i).toLong * b.getInt(i).toLong
      try sum = Math.addExact(sum, p)
      catch { case _: ArithmeticException => return cosine14Slow(a, b, sa, sb) }
      i += 1
    }
    val d =
      if (sum <= (1L << 53) && sum >= -(1L << 53)) sum.toDouble / 1e14
      else new java.math.BigDecimal(
        java.math.BigInteger.valueOf(sum), 14).doubleValue()
    java.lang.Double.valueOf(d / (sa * sb))
  }

  private def cosine14Slow(a: ArrayData, b: ArrayData, sa: Double,
      sb: Double): java.lang.Double = {
    val dec = dot14Slow(a, b)
    if (dec == null) null
    else java.lang.Double.valueOf(dec.toDouble / (sa * sb))
  }

  private def dot14Slow(a: ArrayData, b: ArrayData): org.apache.spark.sql.types.Decimal = {
    val n = a.numElements()
    val bound = java.math.BigInteger.TEN.pow(28)
    var acc = java.math.BigInteger.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = java.math.BigInteger.valueOf(a.getInt(i).toLong)
        .multiply(java.math.BigInteger.valueOf(b.getInt(i).toLong))
      acc = acc.add(p)
      if (acc.abs().compareTo(bound) >= 0) return null
      i += 1
    }
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(acc, 14), 28, 14)
  }
}

case class DecimalQuantize7(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "decimal_quantize7"

  override protected def nullSafeEval(input: Any): Any =
    DecimalDot.quantize7(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.DecimalDot.quantize7($a);")

  override protected def withNewChildInternal(newChild: Expression): DecimalQuantize7 =
    copy(child = newChild)
}

case class QuantizedDot14(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = DecimalType(28, 14)
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_dot14"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalDot.dot14(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.DecimalDot.dot14($a, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot14 =
    copy(left = newLeft, right = newRight)
}

/** `quantized_cosine14(qa, qb, sqrtNormA, sqrtNormB)` — the fused
  * pair-verify cosine (see [[DecimalDot.cosine14]] for the exactness
  * argument). The sqrt-norm doubles are per-VECTOR values the caller
  * projects once (`sqrt(normSqDec(v).cast("double"))`), so the per-pair
  * work is one primitive int loop and one division. */
case class QuantizedCosine14(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType), DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_cosine14"

  override protected def nullSafeEval(a: Any, b: Any, sa: Any, sb: Any): Any =
    DecimalDot.cosine14(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      sa.asInstanceOf[Double], sb.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, sa, sb) => {
      val tmp = ctx.freshName("cos")
      s"""
         |java.lang.Double $tmp =
         |  org.apache.spark.sql.graft.DecimalDot.cosine14($a, $b, $sa, $sb);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): QuantizedCosine14 =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
