package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorMath

/** Similarity search over embedding columns (SURVEY.md §2 sim_*).
  *
  * `bruteForceTopK` is the exact baseline: one scan, per-row cosine, global
  * top-k. Spark plans the sort+limit as TakeOrderedAndProject — each
  * partition keeps its local k, the driver merges k·partitions rows, so the
  * shuffle is O(k), not O(n). That shape survives a 1000-executor scan.
  *
  * The LSH-bucketed path (AnnLsh) is the 100-TB route: random-hyperplane
  * signatures bucket the corpus, candidates come from the probe's bucket
  * only, and the exact re-rank touches a few hundred rows.
  */
object Similarity {

  /** Exact cosine top-k of the corpus against one query vector (selected
    * by id). The single-row query side is broadcast. */
  def bruteForceTopK(embeddings: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(VectorMath.quantize7(col("embedding")).as("q_q"),
        VectorMath.normSqDec(col("embedding")).as("q_nrm"))
    embeddings
      .filter(col("vec_id") =!= queryId)
      // quantize each corpus vector once; the per-row exact dot and norm
      // are then long arithmetic (see VectorMath.dotDec)
      .select(col("vec_id"), col("label"),
        VectorMath.quantize7(col("embedding")).as("qv"))
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"), col("label"),
        VectorMath.cosineFromDec(
          VectorMath.quantizedDot(col("qv"), col("q_q")),
          VectorMath.quantizedDot(col("qv"), col("qv")), col("q_nrm")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
