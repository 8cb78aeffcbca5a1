package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AlertStore, AnomalyRules, Headline, Pipeline, TimeSeries}
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

  test("detectAll unions the four rules on one schema with full coverage") {
    val events = TimeSeries.base(spark, sf)
    val all = Pipeline.detectAll(events, TimeSeries.rollingFeatures(events)).cache()
    val byRule = all.groupBy("rule_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRule.keySet === Set("threshold_high", "consecutive_drift",
      "oscillating_control", "zscore"))
    assert(byRule("threshold_high") ===
      AnomalyRules.thresholdAlerts(TimeSeries.rollingFeatures(events)).count())
    assert(byRule("zscore") === AnomalyRules.zscoreAlerts(events).count())
  }

  test("alert store appends day partitions and prunes range queries") {
    val events = TimeSeries.base(spark, sf)
    val alerts = Pipeline.detectAll(events, TimeSeries.rollingFeatures(events))
    val store = java.nio.file.Files.createTempDirectory("alerts").toString
    AlertStore.append(alerts, store)
    val n1 = AlertStore.read(spark, store).count()
    assert(n1 === alerts.count())
    AlertStore.append(alerts, store)
    assert(AlertStore.read(spark, store).count() === 2 * n1)
    val q = AlertStore.queryRange(spark, store, 19725, 19730, "high", 50)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(400))
    assert(q.count() <= 50)
    assert(q.filter(col("severity") =!= "high").count() === 0)
    // optional filters: rule-only (no severity), entity-only, and bare range
    val byRule = AlertStore.queryRange(spark, store, 19725, 19730,
      ruleName = Some("zscore"), limit = Int.MaxValue)
    assert(byRule.count() > 0)
    assert(byRule.filter(col("rule_name") =!= "zscore").count() === 0)
    val someUser = alerts.select("user_id").head.getLong(0)
    val byUser = AlertStore.queryRange(spark, store, 19725, 19730,
      userId = Some(someUser), limit = Int.MaxValue)
    assert(byUser.filter(col("user_id") =!= someUser).count() === 0)
    val bare = AlertStore.queryRange(spark, store, 19725, 19730,
      limit = Int.MaxValue)
    assert(bare.count() >= byRule.count() + 0)
  }

  test("AlertStorePruning derives epoch_day partition filters from ts_us ranges") {
    val events = TimeSeries.base(spark, sf)
    val alerts = Pipeline.detectAll(events, TimeSeries.rollingFeatures(events))
    val store = java.nio.file.Files.createTempDirectory("alerts_pr").toString
    AlertStore.append(alerts, store)
    val lo = 1704844800000000L
    val hi = 1705708800000000L
    def tsQuery = AlertStore.read(spark, store)
      .filter(col("ts_us") >= lo && col("ts_us") < hi)
    // other suites may have registered the rule on the shared session —
    // start from a clean slate so the "before" plan really lacks it
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.AlertStorePruning)
    val before = tsQuery.collect().map(_.toString).sorted
    val planBefore = tsQuery.queryExecution.executedPlan.toString
    // without the rule: the ts-only filter cannot prune day partitions
    assert(!planBefore.contains("PartitionFilters: [isnotnull(epoch_day"),
      planBefore.take(500))
    GraftExtensions.register(spark)
    try {
      val planAfter = tsQuery.queryExecution.executedPlan.toString
      assert(planAfter.contains("PartitionFilters: [") &&
        planAfter.contains("epoch_day"), planAfter.take(800))
      // derived predicates are implied — row set identical
      val after = tsQuery.collect().map(_.toString).sorted
      assert(after.sameElements(before))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.AlertStorePruning)
    }
  }

  test("AlertStorePruning ignores tables where epoch_day is not a partition column") {
    // same column names/types as the store layout but epoch_day is a DATA
    // column (and here deliberately violates the div invariant): the rule
    // must not fire — there is nothing to prune and a derived predicate
    // would drop rows
    val dir = java.nio.file.Files.createTempDirectory("not_a_store").toString
    spark.range(10).selectExpr(
      "id * 86400000000 AS ts_us", "CAST(99 AS INT) AS epoch_day")
      .write.mode("overwrite").parquet(dir)          // NOT partitioned
    def q = spark.read.parquet(dir).filter(col("ts_us") >= 2L * 86400000000L)
    val before = q.collect().map(_.toString).sorted
    GraftExtensions.register(spark)
    try {
      val planAfter = q.queryExecution.optimizedPlan.toString
      assert(!planAfter.contains("epoch_day >="), planAfter)
      assert(q.collect().map(_.toString).sorted.sameElements(before))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.AlertStorePruning)
    }
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

  test("approx quantiles stay within 1% rank error of the exact percentiles") {
    val li = Tables.lineitem(spark, sf)
    val approx = Headline.approxQuantiles(li).collect()
    approx.foreach { row =>
      val flag = row.getAs[String]("l_returnflag")
      val vals = li.filter(col("l_returnflag") === flag)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      for ((p, colName) <- Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")) {
        val got = row.getAs[Double](colName)
        // rank of the sketch answer must be within 1% of the target rank
        // (percentile_approx's accuracy contract at 10000)
        val rank = vals.count(_ <= got).toDouble / vals.length
        assert(math.abs(rank - p) <= 0.01 + 1.0 / vals.length,
          s"$flag $colName: value $got sits at rank $rank, wanted ~$p")
      }
    }
  }

  test("text normalization is idempotent and canonicalizes case/punct/whitespace") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello,   WORLD!  42"),
      (2L, "hello world 42"),
      (3L, "  tabs\tand---dashes  "),
      (4L, "already clean text")
    ).toDF("doc_id", "text")
    val once = graft.operators.TextAnalysis.normalize(docs)
    // 1 and 2 normalize to the same canonical form
    val digests = once.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("norm_md5")).toMap
    assert(digests(1L) === digests(2L))
    // idempotent: feeding the normalized text back changes nothing
    val normTexts = docs.withColumn("text",
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " ")))
    val twice = graft.operators.TextAnalysis.normalize(normTexts).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("norm_md5")).toMap
    assert(twice === digests)
    // corpus sanity: every doc yields at least one token
    val corpus = graft.operators.TextAnalysis.normalize(Tables.documents(spark, sf))
    assert(corpus.filter(col("n_tokens_norm") < 1).count() === 0)
  }
}
