package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Reporting / export surface — the Spark-native form of the reference's
  * JSON + gold-table exports and its single-building API:
  *   - canonical nested report document (reference: src/export_json.py:25
  *     `export_building_benchmarking`: portfolio_summary +
  *     benchmark_categories + buildings[])
  *   - gold parquet tables (reference: scripts/export_gold_parquet.py:138
  *     `export_gold_to_parquet`)
  *   - one-entity benchmark result (reference: benchmarking/model.py:15
  *     `benchmark_building`, served by api/main.py:73 POST /benchmark)
  *
  * The nested report builds with collect_list over structs — a single
  * aggregation; the per-entity sections stay distributed until the final
  * document row. Sinks write through Spark's parquet/json writers so
  * they inherit partitioned, atomic output on a cluster.
  */
object Reports {

  /** One-row nested report document mirroring the reference's canonical
    * JSON schema (pipeline name, categories, buildings, portfolio KPIs).
    *
    * `asOf` stamps the document's `generated_at` field (reference:
    * export_json.py:25 emits an ISO-8601 timestamp that
    * validate_json.py:40 requires). It is caller-provided rather than
    * wall-clock so the document stays a pure function of its inputs —
    * pass `Some(Instant.now())` for the reference's behavior, `None`
    * (default) for a timestamp-free deterministic document. */
  def portfolioReport(metrics: DataFrame,
      asOf: Option[java.time.Instant] = None): DataFrame = {
    val doc = portfolioReportBase(metrics)
    asOf match {
      case Some(ts) => doc.select(
        col("pipeline"),
        lit(ts.toString).as("generated_at"),
        col("benchmark_categories"), col("portfolio_summary"), col("buildings"))
      case None => doc
    }
  }

  private def portfolioReportBase(metrics: DataFrame): DataFrame = {
    val buildings = metrics
      .select(struct(
        col("c_custkey").as("building_id"),
        col("c_mktsegment").as("building_type"),
        col("n_orders").as("activity"),
        col("total_spend"),
        col("intensity").as("energy_intensity"),
        (col("intensity") * 0.22).as("co2_intensity"),
        col("rating")).as("b"))
      // collect_list order is not a Spark contract under multi-partition
      // execution — sort INSIDE the array (struct sort keys lead with
      // building_id) so the document is deterministic on any cluster
      .agg(array_sort(collect_list(col("b"))).as("buildings"))
    val summary = Benchmarking.portfolioSummary(metrics)
      .select(struct(
        col("total_entities"), col("total_activity"), col("total_spend"),
        col("weighted_avg_intensity"), col("portfolio_co2_tons"),
        col("top_performer_pct"), col("needs_improvement_pct")).as("portfolio_summary"))
    buildings.crossJoin(summary).select(
      lit("sustainable_building_benchmarking").as("pipeline"),
      struct(
        lit("Excellent < 200000").as("excellent"),
        lit("Good < 250000").as("good"),
        lit("Average < 300000").as("average"),
        lit("Poor >= 300000").as("poor")).as("benchmark_categories"),
      col("portfolio_summary"),
      col("buildings"))
  }

  /** Gold-table export: per-segment summary, rating distribution and
    * portfolio KPIs as separate parquet tables under `outDir`
    * (reference: scripts/export_gold_parquet.py writes one parquet per
    * gold table). */
  def exportGold(metrics: DataFrame, outDir: String): Unit = {
    Benchmarking.groupSummary(metrics)
      .write.mode("overwrite").parquet(s"$outDir/segment_summary")
    Benchmarking.ratingDistribution(metrics)
      .write.mode("overwrite").parquet(s"$outDir/rating_distribution")
    Benchmarking.portfolioSummary(metrics)
      .write.mode("overwrite").parquet(s"$outDir/portfolio_summary")
  }

  /** Canonical JSON document export (reference: export_json.py writes
    * artifacts/json/building_benchmarking.json). `asOf` stamps
    * `generated_at` exactly as on [[portfolioReport]]. */
  def exportJson(metrics: DataFrame, outDir: String,
      asOf: Option[java.time.Instant] = None): Unit =
    portfolioReport(metrics, asOf).coalesce(1).write.mode("overwrite").json(outDir)

  /** Report-schema validation (reference: src/validate_json.py:1 —
    * required fields present, numerics in range). Returns one row per
    * violation; empty result = valid. */
  def validateMetrics(metrics: DataFrame): DataFrame = {
    def violation(name: String, cond: org.apache.spark.sql.Column) =
      metrics.filter(cond).select(
        col("c_custkey").cast("string").as("entity"),
        lit(name).as("violation"))
    violation("missing_segment", col("c_mktsegment").isNull)
      .unionByName(violation("negative_spend", col("total_spend") < 0))
      .unionByName(violation("negative_activity", col("n_orders") < 0))
      .unionByName(violation("invalid_rating",
        !col("rating").isin("NoData", "Excellent", "Good", "Average", "Poor")))
      .unionByName(violation("intensity_mismatch",
        col("n_orders") > 0 &&
          abs(col("intensity") - col("total_spend") / col("n_orders")) > 1e-6))
      .orderBy("entity", "violation")
  }

  /** Document-level schema validation over the ASSEMBLED report — the
    * twin of the reference's validate_json.py:29
    * `validate_building_benchmarking` (which checks the JSON document
    * shape, where [[validateMetrics]] checks the metric rows): required
    * top-level fields, a parseable ISO-8601 `generated_at`, the
    * portfolio_summary KPI fields, the benchmark-category labels when the
    * section is present, and per-item fields inside the buildings array.
    * Accepts either the in-memory [[portfolioReport]] frame or a document
    * read back from [[exportJson]] output. Returns one row per violation
    * (`field`, `violation`); empty result = valid. Structure checks walk
    * the (driver-side) schema; value checks are expressions over the
    * single document row. */
  def validateReport(report: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
    val spark = report.sparkSession
    import spark.implicits._

    def fieldAt(path: Seq[String]): Option[DataType] =
      path.foldLeft(Option(report.schema: DataType)) {
        case (Some(st: StructType), name) => st.find(_.name == name).map(_.dataType)
        case _ => None
      }

    val structural = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val requiredTop = Seq("pipeline", "generated_at", "portfolio_summary", "buildings")
    requiredTop.foreach { f =>
      if (fieldAt(Seq(f)).isEmpty) structural += ((f, "missing_field"))
    }
    val summaryFields =
      Seq("total_entities", "total_activity", "total_spend", "weighted_avg_intensity")
    if (fieldAt(Seq("portfolio_summary")).isDefined) summaryFields.foreach { f =>
      if (fieldAt(Seq("portfolio_summary", f)).isEmpty)
        structural += ((s"portfolio_summary.$f", "missing_field"))
    }
    if (fieldAt(Seq("benchmark_categories")).isDefined)
      Seq("excellent", "good", "average", "poor").foreach { f =>
        if (fieldAt(Seq("benchmark_categories", f)).isEmpty)
          structural += ((s"benchmark_categories.$f", "missing_field"))
      }
    val buildingFields = Seq("building_id", "building_type", "energy_intensity", "rating")
    val buildingsOk = fieldAt(Seq("buildings")) match {
      case Some(ArrayType(st: StructType, _)) =>
        buildingFields.foreach { f =>
          if (!st.fieldNames.contains(f))
            structural += ((s"buildings.$f", "missing_field"))
        }
        true
      case Some(_) => structural += (("buildings", "not_an_array")); false
      case None => false
    }

    def check(field: String, name: String,
        cond: org.apache.spark.sql.Column): DataFrame =
      report.filter(cond)
        .select(lit(field).as("field"), lit(name).as("violation"))

    var checks = Seq.empty[DataFrame]
    if (fieldAt(Seq("pipeline")).isDefined)
      checks :+= check("pipeline", "null_or_empty",
        col("pipeline").isNull || col("pipeline") === "")
    if (fieldAt(Seq("generated_at")).isDefined)
      checks :+= check("generated_at", "invalid_iso8601",
        try_to_timestamp(col("generated_at")).isNull)
    if (fieldAt(Seq("portfolio_summary")).isDefined)
      checks :+= check("portfolio_summary", "null_value",
        col("portfolio_summary").isNull)
    summaryFields.filter(f => fieldAt(Seq("portfolio_summary", f)).isDefined)
      .foreach { f =>
        checks :+= check(s"portfolio_summary.$f", "null_value",
          col("portfolio_summary").getField(f).isNull)
      }
    if (buildingsOk) {
      // a NULL array slips past both size(...)===0 (null comparison) and
      // exists(...) (null, dropped by filter) — flag it explicitly
      checks :+= check("buildings", "null_value", col("buildings").isNull)
      checks :+= check("buildings", "empty_array", size(col("buildings")) === 0)
      buildingFields
        .filter(f => fieldAt(Seq("buildings")).exists {
          case ArrayType(st: StructType, _) => st.fieldNames.contains(f)
          case _ => false
        })
        .foreach { f =>
          checks :+= check(s"buildings.$f", "null_value",
            exists(col("buildings"), b => b.getField(f).isNull))
        }
      // the rating BAND is an enum, not free text: a band the dashboards
      // don't know (schema drift, locale leak) must flag here, not
      // render as a blank bar downstream
      if (fieldAt(Seq("buildings")).exists {
        case ArrayType(st: StructType, _) => st.fieldNames.contains("rating")
        case _ => false
      })
        checks :+= check("buildings.rating", "invalid_rating",
          exists(col("buildings"), b => b.getField("rating").isNotNull &&
            !b.getField("rating")
              .isin("NoData", "Excellent", "Good", "Average", "Poor")))
    }

    val base = structural.toSeq.toDF("field", "violation")
    checks.foldLeft(base)(_ unionByName _).orderBy("field", "violation")
  }

  /** File-facing export validation — the twin of the reference
    * validate_json.py `main()` (src/validate_json.py:70): read an
    * [[exportJson]] output path back and run [[validateReport]] on the
    * document. A missing path or a file that does not parse as JSON
    * returns the corresponding error row — the reference's "file not
    * found" / "invalid JSON" exits — instead of throwing, so a pipeline
    * can gate publication on `validateExport(...).isEmpty` without
    * try/catch plumbing. Only the path-not-found error CLASS maps to
    * the file_not_found row, and the no-inferable-schema class (an
    * existing-but-empty export — a document with no parseable JSON in
    * it) maps to invalid_json; any other AnalysisException
    * (permissions, unsupported scheme, bad filesystem) rethrows — a
    * gate that mislabels an infrastructure failure as a missing file
    * sends the operator hunting the wrong cause (r15 advisor finding). */
  def validateExport(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val err = (v: String) => Seq(("<document>", v)).toDF("field", "violation")
    try {
      val back = spark.read.json(path)
      // a file of non-JSON lines parses to the corrupt-record column (or
      // to no columns at all when every line is blank)
      if (back.columns.isEmpty ||
          back.columns.sameElements(Array("_corrupt_record")))
        err("invalid_json")
      else validateReport(back)
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            e.getCondition.startsWith("PATH_NOT_FOUND") =>
        err("file_not_found")
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            e.getCondition.startsWith("UNABLE_TO_INFER_SCHEMA") =>
        err("invalid_json")
    }
  }

  /** Single-entity benchmark — the library twin of the reference's API
    * endpoint: EUI, threshold rating and recommendations for one building
    * (benchmarking/model.py:15). Pure function: no session needed. */
  final case class BenchmarkResult(buildingId: String, eui: Double,
      performanceRating: String, recommendations: Seq[String])

  def benchmarkBuilding(buildingId: String, area: Double,
      energyConsumption: Double): BenchmarkResult = {
    val eui = if (area > 0) energyConsumption / area else 0.0
    val rating =
      if (eui < 100) "Good"
      else if (eui > 200) "Poor"
      else "Average"
    BenchmarkResult(buildingId, math.rint(eui * 100) / 100, rating,
      Seq("Consider LED lighting upgrades",
        "Review HVAC system efficiency",
        "Implement building automation system"))
  }
}
