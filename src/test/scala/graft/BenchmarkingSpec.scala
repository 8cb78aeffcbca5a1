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

  test("decToDouble single-rounds decimals past 2^53 scaled (r18)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the sf1 finding: a DECIMAL(22,6) whose scaled integer exceeds
    // 2^53 — the direct decimal→double cast double-rounds in DuckDB
    // (int128→double then /10^6) where Spark single-rounds, so
    // corpus-scale roll-ups convert through the exact decimal string
    // on both sides. Pin the Spark half: decToDouble(x) equals the
    // correctly-rounded parse of x's exact digits, for values around
    // the observed divergence point and at 10× it.
    val cases = Seq("27864155010.941593", "27864155010.941592",
      "278641550109.415926", "9007199254.740993", "0.000001")
    val rows = cases.map(s => Row(new java.math.BigDecimal(s)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("d", DecimalType(22, 6)))))
    val got = df.select(
      graft.functions.ExactCast.decToDouble(col("d")).as("v"))
      .collect().map(_.getDouble(0))
    val want = cases.map(java.lang.Double.parseDouble)
    assert(got.toSeq === want.toSeq,
      "decToDouble must equal the correctly-rounded parse of the " +
        "decimal's exact digit string")
  }
}
