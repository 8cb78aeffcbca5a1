package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pipeline orchestration + alert store — the reference's two entry points
  * and its persistence layer:
  *   - `run_etl_pipeline` (src/pipeline_batch.py:191): load → clean →
  *     engineer features → save
  *   - `run_anomaly_detection` (src/models.py:377): run every detector,
  *     union the alert frames, persist
  *   - the PostgreSQL alert store (src/db.py:65 `bulk_insert_anomalies`,
  *     db.py:113 `query_anomalies`) — here a day-partitioned parquet lake,
  *     so range queries prune partitions instead of scanning history.
  */
object Pipeline {

  /** Common alert schema all detectors are projected onto
    * (db.py's anomalies table: ts, zone, metric, score, rule, severity). */
  private def standardize(df: DataFrame, score: org.apache.spark.sql.Column): DataFrame =
    df.select(
      col("event_id"), col("user_id"), col("ts_us"),
      lit("value").as("metric"),
      score.as("score"),
      col("rule_name"), col("severity"))

  /** All four rule detectors, unioned on the standard schema
    * (models.py:377 runs rules + ML and concatenates). */
  def detectAll(events: DataFrame, features: DataFrame): DataFrame = {
    val threshold = standardize(
      AnomalyRules.thresholdAlerts(features), col("score"))
    val consecutive = standardize(
      AnomalyRules.consecutiveRuns(events), col("run_len").cast("double"))
    val oscillation = standardize(
      AnomalyRules.oscillation(events), col("n_changes").cast("double"))
    val zscore = standardize(
      AnomalyRules.zscoreAlerts(events), col("zscore"))
    threshold.unionByName(consecutive).unionByName(oscillation).unionByName(zscore)
      .orderBy("rule_name", "user_id", "ts_us", "event_id")
  }

  /** ETL entry point: events → cleaned + feature frame, persisted
    * (pipeline_batch.py:191). Returns the feature frame. */
  def runEtl(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    val features = TimeSeries.rollingFeatures(TimeSeries.base(spark, dir))
    features.write.mode("overwrite").parquet(outPath)
    features
  }

  /** Detection entry point: detectors over the feature frame, alerts
    * persisted to the day-partitioned store (models.py:377). */
  def runDetection(spark: SparkSession, dir: String, storePath: String): DataFrame = {
    val events = TimeSeries.base(spark, dir)
    val features = TimeSeries.rollingFeatures(events)
    val alerts = detectAll(events, features)
    AlertStore.append(alerts, storePath)
    alerts
  }
}

/** Day-partitioned parquet alert store (the db.py analog). Appends are
  * atomic per task; readers prune partitions on day-range predicates, so a
  * dashboard query over one week never touches the other years. */
object AlertStore {

  def append(alerts: DataFrame, path: String): Unit =
    alerts
      .withColumn("epoch_day", expr("ts_us div 86400000000"))
      .write.mode("append").partitionBy("epoch_day").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range + severity scan — the query_anomalies shape (db.py:113);
    * the day predicate hits only the matching partitions. */
  def queryRange(spark: SparkSession, path: String, startDay: Long,
      endDay: Long, severity: String, limit: Int): DataFrame =
    read(spark, path)
      .filter(col("epoch_day") >= startDay && col("epoch_day") <= endDay
        && col("severity") === severity)
      .orderBy(col("ts_us").desc, col("event_id"))
      .limit(limit)
}
