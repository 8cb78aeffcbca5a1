package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair edges — turns pairwise dedup
  * output (Dedup.ngramJaccard / MinHashLsh.candidatePairs) into dedup
  * CLUSTERS with a canonical representative per cluster, the final step of
  * a corpus-dedup sweep (keep one doc per component).
  *
  * Algorithm: iterative min-label propagation. Each vertex adopts the
  * minimum label in its closed neighbourhood; converges in O(diameter)
  * rounds, and near-dup clusters are small/dense so the diameter is tiny.
  * Every round is one join + aggregate on vertex ids; lineage is truncated
  * with localCheckpoint so the plan stays flat across iterations — the
  * standard Spark shape for iterative graph passes at scale.
  */
object ConnectedComponents {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** (id, component) for every vertex appearing in `pairs` (doc_a, doc_b).
    * Component id = min doc id in the component.
    *
    * If the loop hits `maxIter` before converging (graph diameter >
    * maxIter), the labels are NOT final components: with `strict` (the
    * default) this throws; pass `strict = false` to get the partial labels
    * with a logged warning instead.
    *
    * If the caller guarantees `pairs` holds each undirected edge exactly
    * once (e.g. MinHashLsh.exactPairs, whose first-agree dedup emits
    * unique pairs by construction), pass `pairsDistinct = true` to skip
    * the defensive distinct — one less shuffle over the edge list. */
  def components(pairs: DataFrame, maxIter: Int = 20,
      strict: Boolean = true, pairsDistinct: Boolean = false): DataFrame = {
    // symmetric edge list via one explode — a union of two selects over
    // `pairs` would evaluate the (possibly expensive) pair plan twice
    val sym = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val edges = (if (pairsDistinct) sym else sym.distinct())
      .localCheckpoint(true)
    // initial label = min(id, min direct neighbor): one aggregate that is
    // exactly the first propagation round, so the loop starts a round ahead
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("comp"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbour minimum (via edges) joined against own label
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("nmin"))
      // carry the old label through the join so the convergence count
      // needs no second join against the previous labels
      // lazy checkpoint: the convergence count below materializes it, so
      // each iteration is exactly one job
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint(false)
      changed = next.filter(col("comp") =!= col("old")).count()
      labels = next.select("id", "comp")
      iter += 1
    }
    if (changed > 0) {
      // the cap round still changed labels — that alone doesn't prove the
      // labels are wrong (the fixpoint may have been reached exactly at
      // the cap), so run one verification round before deciding
      val stillChanging = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("nmin"))
        .join(labels, "id")
        .filter(col("nmin") < col("comp"))
        .count()
      if (stillChanging > 0) {
        val msg = s"connected components did not converge in $maxIter rounds " +
          s"($stillChanging labels still improvable) — raise maxIter"
        if (strict) throw new IllegalStateException(msg) else log.warn(msg)
      }
    }
    labels.orderBy("id")
  }

  /** Full dedup sweep: near-dup pairs → components → per-doc verdict
    * (component id, canonical representative = min id, keep flag). Docs
    * with no near-dup edges keep themselves. */
  def dedupClusters(documents: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = components(pairs)
    documents.select(col("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("component"))
      .withColumn("keep", col("doc_id") === col("component"))
      .orderBy("doc_id")
  }
}
