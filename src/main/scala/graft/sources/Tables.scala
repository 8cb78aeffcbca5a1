package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the test-corpus tables (TPC-H-ish star schema plus
  * `events`/`documents`/`embeddings`), mirroring the reference's loaders
  * (reference: benchmarking/model.py:82 `load_benchmark_data`,
  * src/pipeline_batch.py:13 `load_raw_data` — CSV/Parquet ingestion).
  *
  * Scale notes: all loaders are plain declarative `spark.read.parquet`
  * scans, so Catalyst pushes filters/projections into the scan and
  * partition-prunes on a real cluster. Dimension tables (region, nation,
  * supplier, part, customer) are small relative to the facts and should be
  * broadcast at join sites — helpers here never force a shuffle.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` is written with nanosecond parquet timestamps, which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the raw ns
    * longs and truncate to microseconds — the same truncation DuckDB's
    * µs-native timestamp applies — so both engines see identical instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** CSV/JSON round-trip helpers (reference supports CSV + Parquet + JSON
    * sinks: generate_sample_data.py:104-112, benchmarking/model.py:110). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
