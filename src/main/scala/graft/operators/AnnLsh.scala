package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorMath

/** Approximate nearest neighbour via random-hyperplane LSH
  * (SURVEY.md §2 sim_ann_lsh) — the 100-TB route where brute force
  * (Similarity.bruteForceTopK) stops being an option.
  *
  * Hyperplanes are pseudo-random but fully deterministic: component i of
  * plane p in table t is derived from murmur3(t, p, i), so every executor
  * materializes the same planes from expressions alone — nothing is
  * broadcast or collected. Each table hashes a vector to a small bucket id
  * (one sign bit per plane); a probe only ever scans its own buckets, so
  * lookup cost is (corpus / 2^planes) · tables instead of corpus.
  */
object AnnLsh {

  /** Sign-pattern bucket id of `vec` in table `t` (planes sign bits → int).
    * The plane length follows the vector's own dimension — a hard-coded
    * length would null-pad `zip_with` on other dims and silently collapse
    * every vector into one bucket. */
  private def bucketId(vec: Column, t: Int, planes: Int): Column = {
    val signs = transform(sequence(lit(0), lit(planes - 1)), p => {
      // deterministic pseudo-random plane component per (t, p, i)
      val dot = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), size(vec) - 1),
            i => (pmod(hash(lit(t), p, i), lit(2000)).cast("double") / 1000.0) - 1.0),
          (x, r) => coalesce(x.cast("double") * r, lit(0.0))),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, 1).otherwise(0)
    })
    aggregate(signs, lit(0), (acc, s) => acc * 2 + s)
  }

  /** Corpus with one bucket id per hash table. */
  def index(embeddings: DataFrame, tables: Int = 4, planes: Int = 6): DataFrame =
    embeddings.withColumn("buckets",
      array((0 until tables).map(t => bucketId(col("embedding"), t, planes)): _*))

  /** Top-k ANN: candidates = rows sharing any table bucket with the query,
    * exactly re-ranked by cosine. */
  def topK(embeddings: DataFrame, queryId: Long, k: Int,
      tables: Int = 4, planes: Int = 6): DataFrame = {
    val indexed = index(embeddings, tables, planes)
    val q = indexed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("buckets").as("q_buckets"))
    indexed
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      // candidate: any table agrees on the bucket
      .filter(exists(zip_with(col("buckets"), col("q_buckets"), (x, y) => x === y),
        idx => idx))
      .select(col("vec_id"), col("label"),
        VectorMath.cosineDouble(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
