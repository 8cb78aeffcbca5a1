package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Headline, TimeSeries}
import graft.sources.Tables

class AnalyticsExtrasSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  test("range-window mean equals the value on singleton frames") {
    val r = TimeSeries.rangeFeatures(TimeSeries.base(spark, sf))
    assert(r.filter(col("n_range") < 1).count() === 0)
    val singletons = r.filter(col("n_range") === 1)
    assert(singletons.filter(abs(col("mean_range") - col("value")) > 1e-9).count() === 0)
  }

  test("as-of lookup: the first event per key has no prior purchase") {
    val a = TimeSeries.asofLastPurchase(TimeSeries.base(spark, sf))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val firsts = a.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(firsts.filter(col("last_purchase_value").isNotNull).count() === 0)
    // and every non-null lookup value is a value some purchase event holds
    val purchaseValues = TimeSeries.base(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("value").distinct().collect().map(_.getDouble(0)).toSet
    val carried = a.filter(col("last_purchase_value").isNotNull)
      .select("last_purchase_value").distinct().collect().map(_.getDouble(0)).toSet
    assert(carried.subsetOf(purchaseValues))
  }

  test("monthly trend growth is consistent with the revenue series") {
    val rows = Headline.monthlyTrend(Tables.orders(spark, sf)).collect()
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        val p = prev.getAs[Double]("revenue")
        val expected = if (p != 0.0) (cur.getAs[Double]("revenue") - p) / p else Double.NaN
        if (p != 0.0) {
          assert(math.abs(cur.getAs[Double]("mom_growth") - expected) < 1e-12)
        }
      case _ => ()
    }
    assert(rows.head.isNullAt(rows.head.fieldIndex("mom_growth")))
  }

  test("HLL approx distinct within 5% of exact") {
    val r = Headline.approxDistinct(Tables.lineitem(spark, sf)).collect()
    r.foreach { row =>
      val err1 = math.abs(row.getAs[Long]("approx_parts") - row.getAs[Long]("exact_parts"))
        .toDouble / row.getAs[Long]("exact_parts")
      val err2 = math.abs(row.getAs[Long]("approx_orders") - row.getAs[Long]("exact_orders"))
        .toDouble / row.getAs[Long]("exact_orders")
      assert(err1 < 0.05 && err2 < 0.05, s"HLL errors $err1 / $err2")
    }
  }
}
