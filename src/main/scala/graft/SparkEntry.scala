package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory and
  * §4 for the cross-engine determinism rules every query/oracle pair obeys.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Headline.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- benchmarking engine (SURVEY §2: bm_*) ---
    "bm_entity_metrics" -> ((s, dir) => Benchmarking.metricsFor(s, dir)),
    "bm_rating_dist" -> ((s, dir) =>
      Benchmarking.ratingDistribution(Benchmarking.metricsFor(s, dir))),
    "bm_group_summary" -> ((s, dir) =>
      Benchmarking.groupSummary(Benchmarking.metricsFor(s, dir))),
    "bm_portfolio_summary" -> ((s, dir) =>
      Benchmarking.portfolioSummary(Benchmarking.metricsFor(s, dir))),
    "bm_percentile" -> ((s, dir) =>
      Benchmarking.percentiles(Benchmarking.metricsFor(s, dir))),
    "bm_co2" -> ((s, dir) => Benchmarking.co2Bands(Benchmarking.metricsFor(s, dir))),
    "bm_recommendations" -> ((s, dir) =>
      Benchmarking.recommendations(Benchmarking.metricsFor(s, dir))),
    "bm_top_entities" -> ((s, dir) =>
      Benchmarking.topEntitiesPerGroup(Benchmarking.metricsFor(s, dir), 3)),
    // --- headline analytics (SURVEY §2: q_*) ---
    "q_pricing_summary" -> ((s, dir) =>
      Headline.pricingSummary(Tables.lineitem(s, dir))),
    "q_top_nations" -> ((s, dir) => Headline.topNationRevenue(s, dir, 10)),
  )

  /** Shared DuckDB CTE mirroring Benchmarking.entityMetrics — the SQL twin
    * of the Spark plan, op-for-op, so doubles match bit-for-bit. */
  private val metricsCte: String =
    """WITH m AS (
      |  SELECT c_custkey, c_mktsegment, n_orders, total_spend,
      |         total_spend / greatest(n_orders, 1) AS intensity,
      |         CASE WHEN n_orders = 0 THEN 'NoData'
      |              WHEN total_spend / greatest(n_orders, 1) < 200000 THEN 'Excellent'
      |              WHEN total_spend / greatest(n_orders, 1) < 250000 THEN 'Good'
      |              WHEN total_spend / greatest(n_orders, 1) < 300000 THEN 'Average'
      |              ELSE 'Poor' END AS rating
      |  FROM (
      |    SELECT c_custkey, c_mktsegment,
      |           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
      |           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
      |    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    GROUP BY 1, 2))""".stripMargin

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys → driver records rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "bm_entity_metrics" ->
      s"""$metricsCte
         |SELECT c_custkey, c_mktsegment, n_orders, total_spend, intensity, rating
         |FROM m ORDER BY c_custkey""".stripMargin,

    "bm_rating_dist" ->
      s"""$metricsCte
         |SELECT rating, CAST(count(*) AS BIGINT) AS n FROM m
         |GROUP BY rating ORDER BY rating""".stripMargin,

    "bm_group_summary" ->
      s"""$metricsCte,
         |r AS (
         |  SELECT m.*,
         |         row_number() OVER (PARTITION BY c_mktsegment
         |                            ORDER BY total_spend, c_custkey) AS rn,
         |         CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS cnt
         |  FROM m),
         |g AS (
         |  SELECT c_mktsegment,
         |         CAST(count(*) AS BIGINT) AS n_entities,
         |         sum(CAST(total_spend AS DECIMAL(18,2))) AS s1,
         |         sum(CAST(total_spend AS DECIMAL(18,2))
         |             * CAST(total_spend AS DECIMAL(18,2))) AS s2,
         |         min(CASE WHEN rn = (cnt + 1) // 2 THEN total_spend END) AS med_lo,
         |         min(CASE WHEN rn = cnt // 2 + 1 THEN total_spend END) AS med_hi
         |  FROM r GROUP BY 1)
         |SELECT c_mktsegment, n_entities,
         |       CAST(s1 AS DOUBLE) AS total_spend,
         |       CAST(s1 AS DOUBLE) / n_entities AS avg_spend,
         |       (med_lo + med_hi) / 2.0 AS median_spend,
         |       CAST(CAST(sqrt(greatest(
         |         (CAST(s2 AS DOUBLE)
         |           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_entities)
         |           / nullif(n_entities - 1, 0),
         |         0.0)) AS DECIMAL(18,2)) AS DOUBLE) AS std_spend
         |FROM g ORDER BY c_mktsegment""".stripMargin,

    "bm_portfolio_summary" ->
      s"""$metricsCte,
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS total_entities,
         |         CAST(sum(n_orders) AS BIGINT) AS total_activity,
         |         sum(CAST(total_spend AS DECIMAL(18,2))) AS spend_dec,
         |         CAST(sum(CASE WHEN rating IN ('Excellent','Good') THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
         |         CAST(sum(CASE WHEN rating = 'Poor' THEN 1 ELSE 0 END) AS BIGINT) AS n_poor
         |  FROM m)
         |SELECT total_entities, total_activity,
         |       CAST(spend_dec AS DOUBLE) AS total_spend,
         |       CAST(spend_dec AS DOUBLE) / total_activity AS weighted_avg_intensity,
         |       CAST(spend_dec AS DOUBLE) * CAST(0.00022 AS DOUBLE) AS portfolio_co2_tons,
         |       CAST(n_top AS DOUBLE) * 100.0 / total_entities AS top_performer_pct,
         |       CAST(n_poor AS DOUBLE) * 100.0 / total_entities AS needs_improvement_pct
         |FROM a""".stripMargin,

    "bm_percentile" ->
      s"""$metricsCte
         |SELECT c_custkey, c_mktsegment, intensity,
         |       percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY intensity) AS pct_rank
         |FROM m ORDER BY c_custkey""".stripMargin,

    "bm_co2" ->
      s"""$metricsCte
         |SELECT c_custkey, intensity,
         |       intensity * CAST(0.22 AS DOUBLE) AS co2_intensity,
         |       CASE WHEN intensity * CAST(0.22 AS DOUBLE) < 44000 THEN 'excellent'
         |            WHEN intensity * CAST(0.22 AS DOUBLE) < 55000 THEN 'good'
         |            WHEN intensity * CAST(0.22 AS DOUBLE) < 66000 THEN 'average'
         |            ELSE 'poor' END AS co2_band
         |FROM m ORDER BY c_custkey""".stripMargin,

    "bm_recommendations" ->
      s"""$metricsCte
         |SELECT c_custkey, rating,
         |       unnest(CASE
         |         WHEN rating = 'Poor' THEN ['Consider LED lighting upgrades',
         |                                    'Review HVAC system efficiency',
         |                                    'Implement building automation system']
         |         WHEN rating = 'Average' THEN ['Review HVAC system efficiency',
         |                                       'Implement building automation system']
         |         WHEN rating = 'Good' THEN ['Consider LED lighting upgrades']
         |         ELSE CAST([] AS VARCHAR[]) END) AS recommendation
         |FROM m ORDER BY c_custkey, recommendation""".stripMargin,

    "bm_top_entities" ->
      s"""$metricsCte,
         |r AS (
         |  SELECT c_mktsegment, c_custkey, intensity, rating,
         |         CAST(row_number() OVER (PARTITION BY c_mktsegment
         |                                 ORDER BY intensity DESC, c_custkey) AS INTEGER) AS rank_in_segment
         |  FROM m)
         |SELECT c_mktsegment, rank_in_segment, c_custkey, intensity, rating
         |FROM r WHERE rank_in_segment <= 3
         |ORDER BY c_mktsegment, rank_in_segment""".stripMargin,

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
        |         AS DECIMAL(17,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
        |         AS DECIMAL(17,4))
        |         * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))
        |         AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_top_nations" ->
      """SELECT n_name, r_name,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name
        |ORDER BY revenue DESC, n_name
        |LIMIT 10""".stripMargin,
  )
}
