package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Alerts, AnomalyRules, TimeSeries}

class TimeSeriesSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  lazy val events = TimeSeries.base(spark, sf).cache()

  test("clean forward-fills error readings and drops leading nulls") {
    val cleaned = TimeSeries.clean(events)
    assert(cleaned.filter(col("value_filled").isNull).count() === 0)
    // rows only drop when a key's first reading(s) are error events
    assert(cleaned.count() <= events.count())
    assert(cleaned.count() > events.count() * 9 / 10)
  }

  test("rolling mean equals value on each key's first row") {
    val feats = TimeSeries.rollingFeatures(events)
    val firsts = feats
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us", "event_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(abs(col("mean_3") - col("value")) > 1e-9).count() === 0)
    assert(firsts.filter(col("std_3") =!= 0.0).count() === 0)
  }

  test("lagDelta: delta equals value - lag") {
    val ld = TimeSeries.lagDelta(events)
    val bad = ld.filter(col("value_lag1").isNotNull)
      .filter(abs(col("delta") - (col("value") - col("value_lag1"))) > 1e-12)
    assert(bad.count() === 0)
  }

  test("resample buckets partition all events") {
    val rs = TimeSeries.resampleHourly(events)
    assert(rs.agg(sum("n_events")).collect().head.getLong(0) === events.count())
  }

  test("sessionize covers all events with positive-length sessions") {
    val sess = TimeSeries.sessionize(events)
    assert(sess.agg(sum("n_events")).collect().head.getLong(0) === events.count())
    assert(sess.filter(col("session_end_us") < col("session_start_us")).count() === 0)
  }

  test("threshold alerts respect both conjuncts") {
    val alerts = AnomalyRules.thresholdAlerts(TimeSeries.rollingFeatures(events))
    assert(alerts.filter(col("value") <= 150 || col("score") <= 1.0).count() === 0)
  }

  test("consecutive runs are all above threshold with run_len >= 3") {
    val runs = AnomalyRules.consecutiveRuns(events)
    assert(runs.filter(col("value") <= 100 || col("run_len") < 3).count() === 0)
  }

  test("zscore alerts are beyond the cut") {
    val z = AnomalyRules.zscoreAlerts(events)
    assert(z.filter(abs(col("zscore")) <= 2.5).count() === 0)
  }

  test("alert summary counts each dimension fully") {
    val alerts = AnomalyRules.thresholdAlerts(TimeSeries.rollingFeatures(events)).cache()
    val total = alerts.count()
    val s = Alerts.summary(alerts).cache()
    val bySev = s.filter(col("severity").isNotNull)
      .agg(sum("n")).collect().head.getLong(0)
    val byType = s.filter(col("event_type").isNotNull)
      .agg(sum("n")).collect().head.getLong(0)
    assert(bySev === total && byType === total)
  }

  test("filterAlerts honors range, severity, limit and descending order") {
    val alerts = AnomalyRules.thresholdAlerts(TimeSeries.rollingFeatures(events))
    val f = Alerts.filterAlerts(alerts, 1704844800000000L, 1705708800000000L, "high", 5)
    val rows = f.collect()
    assert(rows.length <= 5)
    assert(rows.forall(r => r.getAs[String]("severity") == "high"))
    val ts = rows.map(_.getAs[Long]("ts_us"))
    assert(ts.sameElements(ts.sorted.reverse))
  }

  test("filterAlerts filters are independently optional (db.py semantics)") {
    val alerts = AnomalyRules.thresholdAlerts(TimeSeries.rollingFeatures(events))
      .cache()
    val total = alerts.count()
    // no filters at all → just newest-first + limit
    assert(Alerts.filterAlerts(alerts, limit = Int.MaxValue).count() === total)
    // rule-only filter, no severity/time bounds
    val byRule = Alerts.filterAlerts(alerts,
      ruleName = Some("threshold_high"), limit = Int.MaxValue)
    assert(byRule.count() === total) // every threshold alert carries this rule
    assert(Alerts.filterAlerts(alerts, ruleName = Some("nope"), limit = 10)
      .count() === 0)
    // zone/entity-only filter
    val someUser = alerts.select("user_id").head.getLong(0)
    val byUser = Alerts.filterAlerts(alerts, userId = Some(someUser),
      limit = Int.MaxValue)
    assert(byUser.count() === alerts.filter(col("user_id") === someUser).count())
    // severity + rule combine conjunctively
    val both = Alerts.filterAlerts(alerts, severity = Some("high"),
      ruleName = Some("threshold_high"), limit = Int.MaxValue)
    assert(both.count() === alerts.filter(col("severity") === "high").count())
  }

  test("rule summary covers every alert in each dimension; top entities ranked") {
    val alerts = graft.operators.Pipeline.detectAll(events,
      TimeSeries.rollingFeatures(events)).cache()
    val total = alerts.count()
    val s = Alerts.summaryByRule(alerts).cache()
    val bySev = s.filter(col("severity").isNotNull)
      .agg(sum("n")).collect().head.getLong(0)
    val byRule = s.filter(col("rule_name").isNotNull)
      .agg(sum("n")).collect().head.getLong(0)
    val byUser = s.filter(col("user_id").isNotNull)
      .agg(sum("n")).collect().head.getLong(0)
    assert(bySev === total && byRule === total && byUser === total)
    // all four rules appear as rule-dimension rows
    assert(s.filter(col("rule_name").isNotNull).count() === 4)
    val top = Alerts.summaryTopEntities(alerts, 5).collect()
    assert(top.length === 5)
    val counts = top.map(_.getAs[Long]("n_alerts"))
    assert(counts.sameElements(counts.sorted.reverse))
    // the hottest entity really has the max per-user alert count
    val maxCount = alerts.groupBy("user_id").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(counts.head === maxCount)
  }

  test("linear interpolation: planted gaps recover the line; boundaries fall back") {
    import spark.implicits._
    // one key: readings 10.0 @t=0 and 20.0 @t=10; dropouts at t=4 and t=6
    // must land ON the line (14.0, 16.0); a leading dropout bfills, a
    // trailing dropout ffills; non-dropout rows pass through untouched
    val rows = Seq(
      (1L, 9L, -5L, "error", 99.0),   // leading dropout -> bfill 10.0
      (2L, 9L, 0L, "read", 10.0),
      (3L, 9L, 4L, "error", 99.0),    // -> 10 + (20-10)*4/10 = 14.0
      (4L, 9L, 6L, "error", 99.0),    // -> 16.0
      (5L, 9L, 10L, "read", 20.0),
      (6L, 9L, 15L, "error", 99.0)    // trailing dropout -> ffill 20.0
    ).toDF("event_id", "user_id", "ts_us", "event_type", "value")
    val got = TimeSeries.interpolate(rows).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value_interp"),
        r.getAs[Boolean]("is_interpolated")))
    assert(got.toSeq === Seq(
      (1L, 10.0, true), (2L, 10.0, false), (3L, 14.0, true),
      (4L, 16.0, true), (5L, 20.0, false), (6L, 20.0, true)))
    // corpus sanity: every surviving row is non-null and non-dropout rows
    // keep their reading exactly
    val corpus = TimeSeries.interpolate(events)
    assert(corpus.filter(col("value_interp").isNull).count() === 0)
    val passthrough = corpus.filter(!col("is_interpolated"))
      .join(events.filter(col("event_type") =!= "error"), Seq("event_id"))
      .filter(col("value_interp") =!= col("value"))
    assert(passthrough.count() === 0)
  }

  test("time-bounded summary equals summary of the time-filtered frame") {
    val alerts = AnomalyRules.thresholdAlerts(TimeSeries.rollingFeatures(events))
    val lo = 1704844800000000L
    val hi = 1705708800000000L
    val got = Alerts.summary(alerts, lo, hi).collect()
    val want = Alerts.summary(
      alerts.filter(col("ts_us") >= lo && col("ts_us") < hi)).collect()
    assert(got.sameElements(want))
  }
}
