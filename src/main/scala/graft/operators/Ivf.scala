package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorMath

/** IVF-style approximate nearest neighbour (SURVEY.md sim_* scale path,
  * complementing the random-hyperplane AnnLsh): the corpus is coarsely
  * partitioned (here by the `label` column — in a full system, by k-means
  * cell), one centroid per partition is computed, and a probe searches
  * only the `nprobe` partitions whose centroids are closest.
  *
  * Scale: centroids are one aggregate over the corpus (map-side combined
  * per label) and are tiny — broadcast to score probes; the search scan
  * prunes to nprobe partitions, so lookup cost is corpus·(nprobe/cells).
  */
object Ivf {

  /** Per-cell centroid as an average embedding (posexplode → mean per
    * dimension → re-assembled in position order). */
  def centroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"),
        transform(col("pm"), x => x.getField("m").cast("float")).as("centroid"))

  /** Top-k ANN: rank cells by centroid cosine to the query, search the
    * best `nprobe` cells exactly. */
  def topK(embeddings: DataFrame, queryId: Long, k: Int, nprobe: Int = 2): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val cellRank = centroids(embeddings)
      .crossJoin(broadcast(q))
      .select(col("label"),
        VectorMath.cosineDouble(col("centroid"), col("q_emb")).as("c_cos"))
      .orderBy(col("c_cos").desc, col("label"))
      .limit(nprobe)
      .select("label")
    embeddings
      .join(broadcast(cellRank), "label")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        VectorMath.cosineDouble(col("embedding"), col("q_emb")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}
