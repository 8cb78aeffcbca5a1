package graft
// temporary profiling harness — not part of the library
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("warm") { docs.count() }
    // piecewise: rep collapse, pairs, CC
    val normed = docs.withColumn("norm_hash", md5(
      concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))
        .cast("binary")))
    val reps = normed.groupBy("norm_hash").agg(min(col("doc_id")).as("rep_id"))
    val repDocs = time("repDocs materialize") {
      val r = normed.join(reps, "norm_hash")
        .filter(col("doc_id") === col("rep_id"))
        .select("doc_id", "text").localCheckpoint(true)
      println(r.count()); r
    }
    val pairs = time("exactPairs(reps)") {
      val p = MinHashLsh.exactPairs(repDocs, 0.9).localCheckpoint(true)
      println(p.count()); p
    }
    time("components") {
      println(ConnectedComponents.components(pairs).count())
    }
    time("clusterExact full") {
      println(Dedup.clusterExact(docs, 0.9).count())
    }
    time("clusterExact full again") {
      println(Dedup.clusterExact(docs, 0.9).count())
    }
    spark.stop()
  }
}
