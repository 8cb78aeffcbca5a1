package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector math over `array<float>` embedding columns.
  *
  * Two tiers:
  *   - `dotDec`/`cosineFromDec`: exact-decimal dot products. Element
  *     products are cast to DECIMAL(18,9) and summed in DECIMAL(38,18) —
  *     accumulation-order-free, so Spark and a DuckDB oracle agree
  *     bit-for-bit. Used by the oracle-checked similarity queries.
  *   - `dotDouble`: plain double fold (whole-stage-codegen'd `aggregate`
  *     over `zip_with`) — the fast path for the approximate/LSH operators
  *     where cross-engine bit-equality is not required.
  *
  * Both run per-row with no shuffle; a top-k over them is a single scan +
  * TakeOrdered, which on a cluster is a per-partition top-k merged on the
  * driver — no global sort.
  */
object VectorMath {

  // Element scale is chosen so (a) float→decimal casts (via DOUBLE — a
  // direct FLOAT cast is scaled in float32 precision by DuckDB and loses
  // digits) never sit on rounding midpoints, (b) decimal addition stays
  // under Spark's 38-digit cap, and (c) the final sums' unscaled values
  // stay below 2^53 so the →DOUBLE conversion is exact in both engines
  // (otherwise DuckDB double-rounds int128/10^s vs Java's single rounding).
  private val d9   = DecimalType(9, 7)
  private val dAcc = DecimalType(28, 14)

  /** Exact decimal dot product of two float-array columns — the native
    * kernel pair (quantize per vector, long-arithmetic dot per pair),
    * bit-identical to [[dotDecExpr]] (property-specced). Callers joining
    * many pairs per vector should project [[quantize7]] once per side
    * and dot the quantized columns directly — the per-element
    * shortest-decimal conversion is the expensive step. */
  def dotDec(a: Column, b: Column): Column =
    quantizedDot(quantize7(a), quantize7(b))

  /** Scale-7 unscaled quantization of a float-array column (the
    * double→DECIMAL(9,7) cast per element, as longs). */
  def quantize7(a: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.decimalQuantize7(a)

  /** DECIMAL(28,14) dot of two [[quantize7]] columns. */
  def quantizedDot(qa: Column, qb: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.quantizedDot14(qa, qb)

  /** The original interpreted expression-chain form of [[dotDec]] — the
    * semantic REFERENCE the kernels are specced bit-identical to (and
    * the shape the DuckDB oracle SQL mirrors); not on any hot path. */
  private[graft] def dotDecExpr(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double").cast(d9) * y.cast("double").cast(d9)),
      lit(java.math.BigDecimal.ZERO).cast(dAcc),
      (acc, x) => (acc + x).cast(dAcc))

  /** Exact decimal squared norm. */
  def normSqDec(a: Column): Column = {
    val q = quantize7(a)
    quantizedDot(q, q)
  }

  /** Cosine from a decimal dot and two decimal squared norms — the final
    * scalar ops run in double with a fixed shape both engines reproduce. */
  def cosineFromDec(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Fast double dot product — the native codegen expression
    * (org.apache.spark.sql.graft.FloatDotProduct); not oracle-exact across engines. */
  def dotDouble(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.floatDot(a, b)

  /** Fast double cosine. */
  def cosineDouble(a: Column, b: Column): Column =
    dotDouble(a, b) / (sqrt(dotDouble(a, a)) * sqrt(dotDouble(b, b)))
}
