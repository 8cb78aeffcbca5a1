package graft.functions

import org.apache.spark.sql.Column

/** Cross-engine-deterministic numeric conversions (r18).
  *
  * The one rule SURVEY.md §4 could not cover with "identical IEEE op
  * chains" alone: converting an exact DECIMAL aggregate to DOUBLE is a
  * SINGLE op whose rounding differs between engines once the decimal's
  * scaled integer exceeds 2⁵³. Spark rounds once
  * (BigDecimal→double), but DuckDB converts the scaled int128 to
  * double and then divides by 10^scale — two roundings. The r17 sf1
  * oracle run caught exactly this: q_pricing_summary's sum_charge
  * (DECIMAL(·,6); scaled value ≈ 2.8e16 > 2⁵³) differed in the last
  * ulp while every smaller-scale column matched.
  *
  * [[decToDouble]] routes the conversion through the decimal's exact
  * decimal-string rendering, which both engines produce identically
  * (plain digits, fixed scale) and both parse with correctly-rounded
  * string→double (Java `Double.parseDouble`; DuckDB fast_float) — one
  * rounding, the same rounding, at any magnitude. The oracle twin is
  * `CAST(CAST(x AS VARCHAR) AS DOUBLE)`.
  *
  * Use it on UNBOUNDED decimal aggregates (corpus-wide or
  * per-large-group roll-ups, which cross 2⁵³ somewhere between sf1
  * and the 100-TB design point). Bounded-window sums (e.g. the
  * 24-row rolling windows in TimeSeries) stay far under 2⁵³ at any
  * corpus size and keep the direct cast.
  */
object ExactCast {
  def decToDouble(c: Column): Column = c.cast("string").cast("double")
}
