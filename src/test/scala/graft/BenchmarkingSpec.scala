package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Benchmarking, Headline}
import graft.sources.Tables

class BenchmarkingSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  lazy val metrics = Benchmarking.metricsFor(spark, sf).cache()

  test("entityMetrics keeps every customer and computes intensity = spend/activity") {
    val nCustomers = Tables.customer(spark, sf).count()
    assert(metrics.count() === nCustomers)
    val bad = metrics
      .filter(col("n_orders") > 0)
      .filter(abs(col("intensity") - col("total_spend") / col("n_orders")) > 1e-9)
      .count()
    assert(bad === 0)
  }

  test("ratings cover the defined bands only") {
    val ratings = metrics.select("rating").distinct().collect().map(_.getString(0)).toSet
    assert(ratings.subsetOf(Set("NoData", "Excellent", "Good", "Average", "Poor")))
  }

  test("groupSummary has one row per segment, median between min and max") {
    val gs = Benchmarking.groupSummary(metrics).collect()
    val nSegments = metrics.select("c_mktsegment").distinct().count()
    assert(gs.length === nSegments)
    gs.foreach { r =>
      val avg = r.getAs[Double]("avg_spend")
      val med = r.getAs[Double]("median_spend")
      val std = r.getAs[Double]("std_spend")
      assert(med > 0 && avg > 0 && std >= 0)
    }
  }

  test("portfolioSummary percentages are consistent") {
    val r = Benchmarking.portfolioSummary(metrics).collect().head
    val top = r.getAs[Double]("top_performer_pct")
    val poor = r.getAs[Double]("needs_improvement_pct")
    assert(top >= 0 && top <= 100 && poor >= 0 && poor <= 100 && top + poor <= 100)
  }

  test("percentiles are within [0,1]") {
    val bad = Benchmarking.percentiles(metrics)
      .filter(col("pct_rank") < 0 || col("pct_rank") > 1).count()
    assert(bad === 0)
  }

  test("topEntitiesPerGroup returns at most k per segment, ranked") {
    val top = Benchmarking.topEntitiesPerGroup(metrics, 3)
    val over = top.groupBy("c_mktsegment").count().filter(col("count") > 3).count()
    assert(over === 0)
  }

  test("entry (flagship pricing summary) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("pricing summary sums are positive and counts add up") {
    val li = Tables.lineitem(spark, sf)
    val res = Headline.pricingSummary(li)
    val total = res.agg(sum("count_order")).collect().head.getLong(0)
    val expected = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === expected)
  }
}
