package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Headline analytics — the wide-scan summary reports the reference's ETL
  * produces (reference: generate_sample_data.py:115 summary statistics,
  * scripts/export_gold_parquet.py:138 gold-table roll-ups), expressed as
  * bench-anchor queries over the fact tables.
  *
  * Scale: `pricingSummary` is a single map-side-combinable hash aggregate
  * over the biggest fact table (the canonical TPC-H Q1 shape — partial
  * aggregation means the shuffle carries only (group × partition) rows).
  * `topNationRevenue` broadcasts the two tiny dims and shuffles the fact
  * once on the join key.
  */
object Headline {

  private val dec  = DecimalType(18, 2)
  private val dec2 = DecimalType(12, 2)
  private val dec4 = DecimalType(4, 2)

  /** Pricing summary report: exact decimal sums/averages per flag/status
    * over shipped lineitems. All money math stays in exact decimals
    * (12,2)×(4,2)×(4,2) → (22,6), which both Spark and DuckDB compute
    * losslessly, then converts to double for the final scalars via
    * [[graft.functions.ExactCast.decToDouble]] — the corpus-wide sums
    * cross 2⁵³ scaled (sum_charge already does at sf1, where the
    * direct cast diverged from the oracle by one ulp, r18). */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    import graft.functions.ExactCast.decToDouble
    val price    = col("l_extendedprice").cast(dec2)
    val oneMinus = (lit(1).cast(dec4) - col("l_discount").cast(dec4)).cast(dec4)
    val onePlus  = (lit(1).cast(dec4) + col("l_tax").cast(dec4)).cast(dec4)
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).as("qty_dec"),
        sum(price).as("base_dec"),
        sum((price * oneMinus).cast(DecimalType(17, 4))).as("disc_dec"),
        sum(((price * oneMinus).cast(DecimalType(17, 4)) * onePlus)
          .cast(DecimalType(22, 6))).as("charge_dec"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        decToDouble(col("qty_dec")).as("sum_qty"),
        decToDouble(col("base_dec")).as("sum_base_price"),
        decToDouble(col("disc_dec")).as("sum_disc_price"),
        decToDouble(col("charge_dec")).as("sum_charge"),
        (decToDouble(col("qty_dec")) / col("count_order")).as("avg_qty"),
        (decToDouble(col("base_dec")) / col("count_order")).as("avg_price"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Monthly revenue trend with month-over-month growth — the
    * dashboard-trend analog (reference: src/dashboard_app.py:408 daily
    * counts, generalized to exact revenue + growth rate). */
  def monthlyTrend(orders: DataFrame): DataFrame = {
    // partition-less window: safe ONLY because it runs over the
    // post-aggregation frame, whose cardinality is bounded by the month
    // count (~years*12 rows), never by the order volume — the single
    // partition it forces holds dozens of rows at any data scale
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("y"), col("m"))
    orders
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice").cast(dec)).as("rev_dec"),
        count(lit(1)).as("n_orders"))
      // string-snapped decimal→double: per-month revenue grows with the
      // corpus and crosses 2^53 scaled well before the 100-TB point
      .select(col("y"), col("m"),
        graft.functions.ExactCast.decToDouble(col("rev_dec")).as("revenue"),
        col("n_orders"))
      .withColumn("prev", lag(col("revenue"), 1).over(w))
      .withColumn("mom_growth",
        (col("revenue") - col("prev")) / when(col("prev") =!= 0.0, col("prev")))
      .drop("prev")
      .orderBy("y", "m")
  }

  /** HLL sketch distinct counts beside exact ones (approx_count_distinct
    * is the bounded-memory path for 100 TB distincts; rows-only query —
    * sketch estimates are engine-specific — with a tolerance spec). */
  def approxDistinct(lineitem: DataFrame): DataFrame = {
    // the exact sides run as SEPARATE pre-deduped aggregations, not as
    // countDistinct twins inside one agg: two distinct columns in one
    // Aggregate plan as Expand — every input row replicated once per
    // distinct group (x3 here), the HLL buffers dragged through the
    // expanded shuffle — measured 29-31 s at sf1 vs 1.8-5.5 s for this
    // split form (map-side partial dedup shrinks each distinct stream
    // before its shuffle; the three tiny per-flag results join for free)
    val approx = lineitem.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
    // r21 (VERDICT r20 item 3, settled): the r20 fused explode form (both
    // exact sides from one scan + one distinct) is REVERTED to the r19
    // two-pipeline form. The fused form was kept in r20 on a
    // control-normalized sf0.1 A/B while the driver's own bench read it
    // worse (1.35→1.59 s); this round's interleaved A/B reads the split
    // form faster at BOTH scales (sf1: 2.55→2.06 s min-of-legs, sf0.1:
    // 1.79→1.36 s; controls q_approx_quantile flat, q_pricing_summary
    // drifting less than the margin). The explode doubles scan-side rows
    // and widens the distinct key to (flag, tag, k), which costs more
    // than the saved second scan at every scale measured. isNotNull
    // preserves countDistinct's null semantics (it excluded NULL keys; a
    // bare distinct would count (flag, NULL) as a value).
    def exact(c: String, as: String) =
      lineitem.select(col("l_returnflag"), col(c))
        .filter(col(c).isNotNull).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
    // left joins from the approx frame: a group whose key column is
    // entirely NULL has no row on a pre-deduped exact side (its exact
    // count is 0) — an inner join would silently drop the whole output
    // row, where the one-agg countDistinct form emitted it with 0
    approx
      .join(exact("l_partkey", "exact_parts"), Seq("l_returnflag"), "left")
      .join(exact("l_orderkey", "exact_orders"), Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("approx_parts"),
        coalesce(col("exact_parts"), lit(0L)).as("exact_parts"),
        col("approx_orders"),
        coalesce(col("exact_orders"), lit(0L)).as("exact_orders"))
      .orderBy("l_returnflag")
  }

  /** Bounded-memory quantiles beside the group count (approx_percentile
    * is the KLL/GK-sketch path for 100-TB order statistics — exact
    * percentiles need a full sort or all values in memory per group;
    * rows-only query — sketch estimates are engine-specific — with a
    * rank-error tolerance spec vs the exact percentiles). */
  def approxQuantiles(lineitem: DataFrame): DataFrame =
    // r20: ONE sketch per group queried at three ranks, not three
    // identical sketches — percentile_approx over an array of
    // percentages builds a single QuantileSummaries per group (the
    // update/merge passes are the aggregate's whole cost) and reads it
    // at 0.5/0.9/0.99; the per-rank answers are exactly what three
    // separately-built sketches over the same partitions return.
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ps"))
      .select(col("l_returnflag"), col("n_rows"),
        col("ps").getItem(0).as("p50"),
        col("ps").getItem(1).as("p90"),
        col("ps").getItem(2).as("p99"))
      .orderBy("l_returnflag")

  /** Coverage split via semi/anti joins: how many entities have activity
    * vs none (EXISTS / NOT EXISTS — the reference's orphan checks in
    * db.py's filtered queries, as relational operators). */
  def activityCoverage(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cond = customer("c_custkey") === orders("o_custkey")
    val withOrders = customer.join(orders, cond, "left_semi")
      .agg(count(lit(1)).as("n")).withColumn("category", lit("with_orders"))
    val withoutOrders = customer.join(orders, cond, "left_anti")
      .agg(count(lit(1)).as("n")).withColumn("category", lit("without_orders"))
    withOrders.unionByName(withoutOrders)
      .select("category", "n").orderBy("category")
  }

  /** Revenue by nation/region: multi-join + agg + deterministic top-N
    * (the portfolio-report analog). Dims are broadcast — no shuffle for
    * nation/region; orders⋈customer co-shuffles on custkey once. */
  def topNationRevenue(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val orders   = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation   = broadcast(Tables.nation(spark, dir))
    val region   = broadcast(Tables.region(spark, dir))
    // r20 (guide §2.3 "aggregate before you shuffle"): orders pre-roll to
    // one (custkey, revenue, n) row BEFORE the customer join — map-side
    // partial aggregation ahead of the fact side's exchange, so the join
    // never carries raw order rows. Decimal addition is exact and
    // order-free and counts re-sum, so the nation-level roll-up below is
    // value-identical to aggregating the raw join (oracle-gated);
    // decToDouble string-snaps the same numeric value whatever the
    // intermediate decimal precision.
    orders
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(dec)).as("cust_rev"),
        count(lit(1)).as("cust_n"))
      .join(customer, col("o_custkey") === customer("c_custkey"))
      .join(nation, customer("c_nationkey") === nation("n_nationkey"))
      .join(region, nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(
        sum(col("cust_rev")).as("rev_dec"),
        sum(col("cust_n")).as("n_orders"))
      .select(col("n_name"), col("r_name"),
        // string-snapped: per-nation revenue is a corpus-scale roll-up
        graft.functions.ExactCast.decToDouble(col("rev_dec")).as("revenue"),
        col("n_orders"))
      .orderBy(col("revenue").desc, col("n_name"))
      .limit(k)
  }
}
