package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{AlertStore, AnomalyRules, Benchmarking, Medallion, Reports, TimeSeries}
import graft.sources.{SyntheticData, Tables}
import graft.streaming.{StatefulDrift, StreamingAlerts}

class CompletenessSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  lazy val metrics = Benchmarking.metricsFor(spark, sf).cache()

  test("portfolio report nests every entity and carries the summary") {
    val report = Reports.portfolioReport(metrics).collect().head
    val buildings = report.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("buildings")
    assert(buildings.length === metrics.count())
    val summary = report.getAs[org.apache.spark.sql.Row]("portfolio_summary")
    assert(summary.getAs[Long]("total_entities") === metrics.count())
    assert(report.getAs[String]("pipeline") === "sustainable_building_benchmarking")
  }

  test("portfolio report building order is deterministic under repartition") {
    // scramble the input partitioning; the array must still come back
    // sorted by building_id (array_sort inside the aggregation)
    val scrambled = Reports.portfolioReport(metrics.repartition(13)).collect().head
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("buildings")
      .map(_.getAs[Long]("building_id"))
    assert(scrambled === scrambled.sorted)
    assert(scrambled.length === metrics.count())
  }

  test("runEtl writes the per-feature describe summary sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("etl").toString + "/features"
    graft.operators.Pipeline.runEtl(spark, sf, dir)
    val summary = spark.read.parquet(dir + "_summary")
    assert(summary.columns.toSeq ===
      Seq("feature", "n", "mean", "std", "min", "median", "max"))
    val feats = summary.collect().map(_.getAs[String]("feature")).toSet
    assert(feats === Set("value", "mean_3", "std_3", "mean_12", "std_12"))
    // sanity: stats are internally consistent for every feature
    summary.collect().foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Double]("min") <= r.getAs[Double]("median"))
      assert(r.getAs[Double]("median") <= r.getAs[Double]("max"))
    }
  }

  test("gold export writes readable parquet tables") {
    val dir = java.nio.file.Files.createTempDirectory("gold").toString
    Reports.exportGold(metrics, dir)
    assert(spark.read.parquet(s"$dir/segment_summary").count() > 0)
    assert(spark.read.parquet(s"$dir/rating_distribution").count() > 0)
    assert(spark.read.parquet(s"$dir/portfolio_summary").count() === 1)
  }

  test("json export round-trips the report document") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    Reports.exportJson(metrics, dir)
    val back = spark.read.json(dir)
    assert(back.count() === 1)
    assert(back.columns.toSet.contains("portfolio_summary"))
  }

  test("stamped export round-trips and passes document-level validation") {
    // the full reference loop: export_json (with generated_at) →
    // read back → validate_building_benchmarking — zero violations
    val asOf = java.time.Instant.parse("2026-08-13T00:00:00Z")
    val dir = java.nio.file.Files.createTempDirectory("jsonv").toString
    Reports.exportJson(metrics, dir, asOf = Some(asOf))
    val back = Tables.readJson(spark, dir)
    assert(back.count() === 1)
    assert(back.select("generated_at").head.getString(0) === "2026-08-13T00:00:00Z")
    assert(Reports.validateReport(back).count() === 0)
    // the in-memory stamped report validates identically
    assert(Reports.validateReport(Reports.portfolioReport(metrics, Some(asOf)))
      .count() === 0)
  }

  test("validateReport catches missing fields, bad timestamps and empty arrays") {
    val asOf = java.time.Instant.parse("2026-08-13T00:00:00Z")
    val report = Reports.portfolioReport(metrics, Some(asOf))
    // unstamped document: generated_at is required (validate_json.py:40)
    val unstamped = Reports.validateReport(Reports.portfolioReport(metrics))
    assert(unstamped.collect().map(r => (r.getString(0), r.getString(1)))
      .contains(("generated_at", "missing_field")))
    // garbled timestamp
    val badTs = Reports.validateReport(
      report.withColumn("generated_at", lit("not-a-timestamp")))
    assert(badTs.collect().map(r => (r.getString(0), r.getString(1)))
      .contains(("generated_at", "invalid_iso8601")))
    // dropped top-level section + empty buildings array
    val gutted = Reports.validateReport(
      report.drop("portfolio_summary")
        .withColumn("buildings", slice(col("buildings"), 1, 0)))
    val got = gutted.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("portfolio_summary", "missing_field")))
    assert(got.contains(("buildings", "empty_array")))
    // a NULL buildings array (field present, value null) must be flagged —
    // size(null)===0 and exists(null, ...) both evaluate to null and would
    // silently pass without the explicit null check
    val nulled = Reports.validateReport(report.withColumn("buildings",
      lit(null).cast(Reports.portfolioReport(metrics).schema("buildings").dataType)))
    assert(nulled.collect().map(r => (r.getString(0), r.getString(1)))
      .contains(("buildings", "null_value")))
  }

  test("validateExport gates a good export, a broken one, and a missing path") {
    // the validate_json.py main() loop, file-facing: a freshly stamped
    // export validates clean straight from disk
    val asOf = java.time.Instant.parse("2026-08-13T00:00:00Z")
    val good = java.nio.file.Files.createTempDirectory("vexp-good").toString
    Reports.exportJson(metrics, good, asOf = Some(asOf))
    assert(Reports.validateExport(spark, good).count() === 0)
    // a rating band the dashboards don't know must flag as the enum
    // violation (the band list is the contract, not free text)
    val banded = java.nio.file.Files.createTempDirectory("vexp-band").toString
    Reports.portfolioReport(metrics, Some(asOf))
      .withColumn("buildings", transform(col("buildings"),
        b => b.withField("rating", lit("Stupendous"))))
      .coalesce(1).write.mode("overwrite").json(banded)
    assert(Reports.validateExport(spark, banded)
      .collect().map(r => (r.getString(0), r.getString(1)))
      .contains(("buildings.rating", "invalid_rating")))
    // a gutted document read from disk reports the same structural
    // errors the reference's validator prints
    val broken = java.nio.file.Files.createTempDirectory("vexp-bad").toString
    Reports.portfolioReport(metrics, Some(asOf))
      .drop("portfolio_summary", "generated_at")
      .coalesce(1).write.mode("overwrite").json(broken)
    val got = Reports.validateExport(spark, broken)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("portfolio_summary", "missing_field")))
    assert(got.contains(("generated_at", "missing_field")))
    // non-JSON bytes and a missing path return the reference's two
    // hard-exit cases as error rows instead of throwing
    val junk = java.nio.file.Files.createTempDirectory("vexp-junk").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(junk, "doc.json"),
      "p}{lainly not json".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(Reports.validateExport(spark, junk)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("<document>", "invalid_json")))
    assert(Reports.validateExport(spark, "/no/such/path-xyz")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("<document>", "file_not_found")))
    // an existing-but-empty export (Spark: UNABLE_TO_INFER_SCHEMA) is an
    // unparseable document, not an infrastructure failure — it must gate
    // as invalid_json rather than propagate (r15 advisor finding)
    val empty = java.nio.file.Files.createTempDirectory("vexp-empty").toString
    assert(Reports.validateExport(spark, empty)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("<document>", "invalid_json")))
  }

  test("registerViews exposes the query API surface to SQL-only clients") {
    // the engine-native analog of the reference's HTTP query surface
    // (src/api.py:62-265): every al_/bm_/q_ key becomes a temp view, and
    // plain SQL over the view is row-identical to the Scala registry path
    val views = GraftExtensions.registerViews(spark, sf)
    assert(views.contains("graft_al_summary"))
    assert(views.contains("graft_bm_entity_metrics"))
    assert(views.contains("graft_q_pricing_summary"))
    // all al_/bm_/q_ keys registered, nothing else
    val expected = SparkEntry.queries.keys
      .filter(k => Seq("al_", "bm_", "q_").exists(k.startsWith))
      .map("graft_" + _).toSet
    assert(views.toSet === expected)
    for (key <- Seq("al_summary", "bm_entity_metrics", "q_pricing_summary",
        "al_filter_rule", "bm_top_entities")) {
      val viaSql = spark.sql(s"SELECT * FROM graft_$key").collect()
        .map(_.toSeq).toSeq
      val viaRegistry = SparkEntry.queries(key)(spark, sf).collect()
        .map(_.toSeq).toSeq
      assert(viaSql === viaRegistry, s"view graft_$key diverges from registry")
    }
    // a client-side filter composes through the view (the api.py
    // /alerts?severity=... shape) and agrees with filtering the registry
    val sqlFiltered = spark.sql(
      "SELECT * FROM graft_al_filter_rule WHERE severity = 'high'").count()
    val regFiltered = SparkEntry.queries("al_filter_rule")(spark, sf)
      .filter(col("severity") === "high").count()
    assert(sqlFiltered === regFiltered)
  }

  test("single-building benchmark matches the reference's EUI semantics") {
    val r = Reports.benchmarkBuilding("B001", 1000.0, 50000.0)
    assert(r.eui === 50.0)
    assert(r.performanceRating === "Good")
    assert(Reports.benchmarkBuilding("B002", 1000.0, 250000.0).performanceRating === "Poor")
    assert(Reports.benchmarkBuilding("B003", 1000.0, 150000.0).performanceRating === "Average")
    assert(Reports.benchmarkBuilding("B004", 0.0, 5.0).eui === 0.0)
  }

  test("synthetic buildings have the reference's derived columns") {
    val b = SyntheticData.buildings(spark, 100).cache()
    assert(b.count() === 100)
    assert(b.filter(col("eui") =!= col("energy_consumption") / col("area")).count() === 0)
    val cats = b.select("performance_category").distinct()
      .collect().map(_.getString(0)).toSet
    assert(cats.subsetOf(Set("Excellent", "Good", "Average", "Poor")))
    // deterministic: same seedless expression pipeline → same data
    val again = SyntheticData.buildings(spark, 100)
    assert(b.exceptAll(again).count() === 0)
  }

  test("synthetic hvac carries fault episodes detectable by the batch rules") {
    val h = SyntheticData.hvac(spark, zones = 4, days = 12).cache()
    assert(h.count() === 4L * 12 * 288)
    val faulty = h.filter(col("fault_type") === "temp_drift")
    assert(faulty.count() > 0)
    // drifted readings really deviate from setpoint by > 3°C
    assert(faulty.filter(col("temp_zone_c") - col("setpoint_c") <= 3.0).count() === 0)
  }

  test("native kernels callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS i,
        |       long_array_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS m,
        |       size(embedding_lsh_buckets(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)))) AS nb,
        |       word_ngrams('a b a b', 2, true) AS ng,
        |       quantized_dot14(decimal_quantize7(array(CAST(1.5 AS FLOAT))),
        |                       decimal_quantize7(array(CAST(2.0 AS FLOAT)))) AS qd,
        |       quantized_cosine14(decimal_quantize7(array(CAST(1.5 AS FLOAT))),
        |                          decimal_quantize7(array(CAST(2.0 AS FLOAT))),
        |                          CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)) AS qc
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) === 8)
    assert(r.getSeq[String](4) === Seq("a b", "b a"))
    assert(r.getDecimal(5) === new java.math.BigDecimal("3.00000000000000"))
    assert(r.getDouble(6) === 1.0)
  }

  test("validateMetrics passes clean data and catches corrupted rows") {
    assert(Reports.validateMetrics(metrics).count() === 0)
    val corrupted = metrics.limit(5)
      .withColumn("rating", lit("Bogus"))
      .withColumn("total_spend", lit(-1.0))
    val v = Reports.validateMetrics(corrupted)
    assert(v.filter(col("violation") === "invalid_rating").count() === 5)
    assert(v.filter(col("violation") === "negative_spend").count() === 5)
  }

  test("alert store clearRange drops exactly the requested day partitions") {
    import spark.implicits._
    val day = 86400000000L
    val alerts = Seq(
      (1L, 10L, day * 100 + 5L, "value", 1.0, "r", "high"),
      (2L, 11L, day * 101 + 5L, "value", 2.0, "r", "high"),
      (3L, 12L, day * 102 + 5L, "value", 3.0, "r", "high"))
      .toDF("event_id", "user_id", "ts_us", "metric", "score", "rule_name", "severity")
    val path = java.nio.file.Files.createTempDirectory("alerts").toString + "/store"
    AlertStore.append(alerts, path)
    assert(AlertStore.clearRange(spark, path, 101, 101) === 1L)
    val days = AlertStore.read(spark, path)
      .select(col("epoch_day").cast("long")).collect().map(_.getLong(0)).toSet
    assert(days === Set(100L, 102L))
    assert(AlertStore.queryRange(spark, path, 100, 102, limit = 10).count() === 2)
    // idempotent: clearing an already-clear range is a no-op
    assert(AlertStore.clearRange(spark, path, 101, 101) === 0L)
  }

  test("medallion pipeline writes stamped bronze/silver/gold layers") {
    val root = java.nio.file.Files.createTempDirectory("medallion").toString
    val silver = Medallion.runMedallion(spark, sf, root)
    assert(silver.columns.contains("_transformed_at"))
    assert(spark.read.parquet(s"$root/bronze/customer").columns.contains("_ingested_at"))
    assert(spark.read.parquet(s"$root/bronze/orders").columns.contains("_ingested_at"))
    val silverBack = spark.read.parquet(s"$root/silver/entity_metrics")
    assert(Seq("intensity", "rating", "spend_per_occupant", "entity_age",
      "_transformed_at").forall(silverBack.columns.contains))
    // gold marts match the direct aggregates over the same inputs
    val gotSeg = spark.read.parquet(s"$root/gold/segment_summary")
      .orderBy("c_mktsegment").collect()
    val wantSeg = Benchmarking.groupSummary(metrics).collect()
    assert(gotSeg.sameElements(wantSeg))
    val shares = spark.read.parquet(s"$root/gold/type_shares").collect()
    assert(shares.nonEmpty)
    shares.foreach { r =>
      val a = r.getAs[Double]("active_share")
      val t = r.getAs[Double]("top_rated_share")
      assert(a >= 0.0 && a <= 1.0 && t >= 0.0 && t <= 1.0)
    }
    assert(shares.map(_.getAs[Long]("n_entities")).sum === metrics.count())
  }

  test("stateful streaming drift equals batch islands on replay") {
    val events = TimeSeries.base(spark, sf)
    // batch truth: rows in runs >= 3, positions >= 3 (the moment the run
    // qualifies and everything after)
    val batch = AnomalyRules.consecutiveRuns(events, 100.0, 3)
    val stream = StatefulDrift.detect(
      StreamingAlerts.readEvents(spark, sf)
        .withColumn("ts_us", unix_micros(col("event_time"))))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("drift_out")
      .trigger(Trigger.AvailableNow()).start()
    // drain + explicit stop: the detector's ProcessingTimeTimeout state-GC
    // would otherwise hold the query open until the 1-hour timeout
    TestSpark.drainAndStop(q, "drift_out")
    val got = spark.table("drift_out").select("event_id")
      .collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("event_id").collect().map(_.getLong(0)).toSet
    // streaming emits from the 3rd element of each run onward → subset of
    // the batch's flagged rows, and both agree there are qualifying runs
    assert(got.nonEmpty)
    assert(got.subsetOf(batchIds))
    // every batch-flagged run contributes at least one streaming alert
    val runsWithAlert = batch.filter(col("event_id").isin(got.toSeq: _*))
    assert(runsWithAlert.count() > 0)
  }
}
