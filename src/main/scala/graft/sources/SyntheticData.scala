package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic data generation — the Spark-native form of the reference's
  * two generators:
  *   - building energy records (reference: generate_sample_data.py:15
  *     `extract_data`/`transform_data`: 100 buildings with type, area,
  *     consumption → eui, energy_per_occupant, age, performance category)
  *   - HVAC sensor series (reference: src/generate_hvac_data.py:13
  *     `generate_base_profile`: 5-min interval × zones with daily/weekend
  *     load patterns, plus injected labeled fault episodes)
  *
  * Everything derives from `spark.range` + deterministic hash-based
  * pseudo-randoms — no driver-side loops and no RNG state, so generation
  * parallelizes to any row count and any cluster width and is exactly
  * reproducible (the reference loops in Python over every row:
  * generate_hvac_data.py:37 `for zone ... for ts ...`).
  */
object SyntheticData {

  /** u ~ Uniform[0,1) derived from murmur3 of (id, salt). */
  private def u(salt: Int) =
    pmod(hash(col("id"), lit(salt)), lit(1000000)).cast("double") / 1000000.0

  /** Building energy records with derived metrics + category
    * (generate_sample_data.py columns, including the derived ones). */
  def buildings(spark: SparkSession, n: Long = 100L): DataFrame = {
    val types = array(lit("office"), lit("residential"), lit("retail"),
      lit("industrial"), lit("educational"))
    spark.range(n)
      .select(
        concat(lit("B"), lpad((col("id") + 1).cast("string"), 3, "0")).as("building_id"),
        element_at(types, (pmod(hash(col("id"), lit(1)), lit(5)) + 1).cast("int"))
          .as("building_type"),
        (lit(500.0) + u(2) * 9500.0).as("area"),
        (lit(1970) + pmod(hash(col("id"), lit(3)), lit(53)).cast("int")).as("year_built"),
        (lit(10000.0) + u(4) * 490000.0).as("energy_consumption"),
        (lit(10) + pmod(hash(col("id"), lit(5)), lit(490)).cast("int")).as("occupancy"),
        (pmod(hash(col("id"), lit(6)), lit(2)) === 0).as("has_hvac"),
        (pmod(hash(col("id"), lit(7)), lit(10)) < 3).as("has_solar"))
      .withColumn("eui", col("energy_consumption") / col("area"))
      .withColumn("energy_per_occupant", col("energy_consumption") / col("occupancy"))
      .withColumn("building_age", lit(2026) - col("year_built"))
      .withColumn("performance_category",
        when(col("eui") < 100, "Excellent")
          .when(col("eui") < 150, "Good")
          .when(col("eui") < 200, "Average")
          .otherwise("Poor"))
  }

  /** HVAC sensor series: `zones` zones × 5-min intervals over `days` days,
    * with business-hour/weekend load shaping and two deterministic injected
    * fault patterns (temp drift + clogged filter), labeled like the
    * reference's episodes (generate_hvac_data.py:96 `inject_faults`). */
  def hvac(spark: SparkSession, zones: Int = 10, days: Int = 30,
      startEpochSec: Long = 1704067200L /* 2024-01-01 UTC */): DataFrame = {
    val perDay = 288L // 5-min intervals
    val rows = zones * days * perDay
    val base = spark.range(rows)
      .select(
        col("id"),
        (col("id") % zones).cast("int").as("zone"),
        expr(s"id div $zones").as("tick"))
      .withColumn("ts_sec", lit(startEpochSec) + col("tick") * 300L)
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      .withColumn("hour", hour(col("ts")))
      .withColumn("is_weekend", dayofweek(col("ts")).isin(1, 7))
      .withColumn("day_factor",
        when(col("hour").between(8, 18), 1.5).otherwise(0.5)
          * when(col("is_weekend"), 0.6).otherwise(1.0))
      .withColumn("mode",
        when(col("hour").between(8, 18), "cooling").otherwise("off"))
      .withColumn("zone_id", concat(lit("Z"), (col("zone") + 1).cast("string")))
      .withColumn("setpoint_c", lit(22.0) + (u(10) - 0.5))
      .withColumn("temp_zone_c",
        col("setpoint_c") + (u(11) - 0.5) * 0.6 + (col("day_factor") - 1.0))
      .withColumn("supply_air_temp_c",
        when(col("mode") === "cooling", 14.0).otherwise(18.0) + (u(12) - 0.5))
      .withColumn("return_air_temp_c", col("temp_zone_c") + 1.0 + (u(13) - 0.5) * 0.6)
      .withColumn("power_kw", greatest(lit(0.0), col("day_factor") * 5.0 + (u(14) - 0.5) * 0.6))
      .withColumn("fan_speed_pct",
        least(lit(90.0), greatest(lit(10.0), col("day_factor") * 40.0 + (u(15) - 0.5) * 10.0)))
    // deterministic fault episodes: zone 1 drifts on days 5-6, zone 2's
    // filter clogs (fan+power ramp) on days 10-11
    val day = expr("tick div 288")
    base
      .withColumn("fault_type",
        when(col("zone") === 1 && day.between(5, 6), "temp_drift")
          .when(col("zone") === 2 && day.between(10, 11), "clogged_filter")
          .otherwise("none"))
      .withColumn("temp_zone_c",
        when(col("fault_type") === "temp_drift", col("temp_zone_c") + 4.0)
          .otherwise(col("temp_zone_c")))
      .withColumn("fan_speed_pct",
        when(col("fault_type") === "clogged_filter",
          least(lit(100.0), col("fan_speed_pct") + 20.0))
          .otherwise(col("fan_speed_pct")))
      .withColumn("power_kw",
        when(col("fault_type") === "clogged_filter", col("power_kw") + 2.0)
          .otherwise(col("power_kw")))
      .select("ts", "zone_id", "temp_zone_c", "setpoint_c", "supply_air_temp_c",
        "return_air_temp_c", "power_kw", "fan_speed_pct", "mode", "fault_type")
  }
}
