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

  /** Symmetric-edge-row bound under which [[components]] solves the graph
    * with a driver-side union-find instead of distributed label rounds.
    * The driver footprint is PRIMITIVE: the edge rows arrive as compact
    * UnsafeRow batches and are copied straight into long arrays (src,
    * dst, sorted-unique ids) — ~4M rows ≈ 3 × 32 MB of long[] plus the
    * transient row batch, no boxed tuples, no boxed HashMap (the earlier
    * form's boxed Tuple2 + HashMap[Long, Integer] peaked at several
    * hundred MB on a 4M-edge graph — enough to stress a default 1 GiB
    * driver heap). */
  private[graft] val MaxDriverEdgeRows = 4L << 20

  /** Exact connected components of a small symmetric edge list, solved on
    * the driver: path-compressed union-find over the collected edges,
    * component id = min vertex id (identical to the distributed
    * fixpoint's contract). All driver state is primitive long/int
    * arrays; vertex indexing is binary search over the sorted-unique id
    * array (log n per lookup, zero boxing). */
  private def driverComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // executeCollect returns the compact UnsafeRow batch (2 longs +
    // header per row) — the boxed Row/Tuple2 conversion of a plain
    // collect() is exactly the footprint this path must not have
    val rows = edges.select(col("src"), col("dst"))
      .queryExecution.executedPlan.executeCollect()
    val m = rows.length
    val src = new Array[Long](m)
    val dst = new Array[Long](m)
    var i = 0
    while (i < m) { src(i) = rows(i).getLong(0); dst(i) = rows(i).getLong(1); i += 1 }
    // sorted-unique vertex ids; idx(v) = position by binary search
    val all = new Array[Long](2 * m)
    System.arraycopy(src, 0, all, 0, m)
    System.arraycopy(dst, 0, all, m, m)
    java.util.Arrays.sort(all)
    var n = 0
    i = 0
    while (i < all.length) {
      if (n == 0 || all(i) != all(n - 1)) { all(n) = all(i); n += 1 }
      i += 1
    }
    val ids = all // first n entries are the sorted-unique vertex ids
    def idx(v: Long): Int = java.util.Arrays.binarySearch(ids, 0, n, v)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    i = 0
    while (i < m) {
      val a = find(idx(src(i))); val b = find(idx(dst(i)))
      if (a != b) parent(a) = b
      i += 1
    }
    // component label = min vertex id = id at the smallest member index
    // (ids are sorted, so the first index seen per root is its minimum)
    val minIdx = Array.fill(n)(Int.MaxValue)
    i = 0
    while (i < n) {
      val r = find(i)
      if (i < minIdx(r)) minIdx(r) = i
      i += 1
    }
    (0 until n).map(j => (ids(j), ids(minIdx(find(j))))).toDF("id", "comp")
  }

  /** (id, component) for every vertex appearing in `pairs` (doc_a, doc_b).
    * Component id = min doc id in the component.
    *
    * Graphs under [[MaxDriverEdgeRows]] are solved exactly with a
    * driver-side union-find — `maxIter` is irrelevant there (union-find
    * has no convergence cap). Above the bound, iterative label rounds
    * run; if they hit `maxIter` before converging the labels are NOT
    * final components: with `strict` (the default) this throws; pass
    * `strict = false` to get the partial labels with a logged warning
    * instead. With pointer jumping the rounds needed are O(log diameter),
    * so the default cap of 20 covers any graph a dedup sweep produces.
    *
    * If the caller guarantees `pairs` holds each undirected edge exactly
    * once (e.g. MinHashLsh.exactPairs, whose first-agree dedup emits
    * unique pairs by construction), pass `pairsDistinct = true` to skip
    * the defensive distinct — one less shuffle over the edge list. */
  def components(pairs: DataFrame, maxIter: Int = 20,
      strict: Boolean = true, pairsDistinct: Boolean = false): DataFrame =
    componentsImpl(pairs, maxIter, strict, pairsDistinct, MaxDriverEdgeRows)

  /** [[components]] with the driver-path bound injectable — tests force
    * the distributed label rounds by passing `driverEdgeRowBound = -1`. */
  private[graft] def componentsImpl(pairs: DataFrame, maxIter: Int,
      strict: Boolean, pairsDistinct: Boolean,
      driverEdgeRowBound: Long): DataFrame = {
    // symmetric edge list via one explode — a union of two selects over
    // `pairs` would evaluate the (possibly expensive) pair plan twice
    val sym = pairs
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // materialize the (possibly expensive) pair plan ONCE, before any
    // path decision — both the size probe and whichever solve path runs
    // read this cache, never the pair lineage again. The dst-repartition
    // the distributed rounds want is NOT applied here: the driver path
    // would pay that full edge shuffle just to collect the rows back.
    val symEdges = (if (pairsDistinct) sym else sym.distinct())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // SMALL-GRAPH FAST PATH: distributed label rounds cost several
    // scheduler round-trips regardless of data size — on a graph that
    // fits comfortably on the driver that overhead IS the cost (measured
    // ~3 s for a 29k-edge graph at sf0.1). Below the row bound, solve
    // with a driver-side union-find instead: one collect of the (already
    // materialized) narrow edge list into primitive long arrays,
    // linear-time path-compressed union, same (id, min-of-component)
    // output bit-for-bit. The bound keeps driver memory modest (see
    // [[MaxDriverEdgeRows]]); a 100-TB corpus's near-dup graph blows
    // past it and takes the distributed rounds below — the same
    // bounded-driver-state pattern as the IVF centroid collect.
    val nEdgeRows =
      try symEdges.count()
      catch { case t: Throwable => symEdges.unpersist(false); throw t }
    if (nEdgeRows <= driverEdgeRowBound) {
      // release on every exit — including a driver-path failure mid-
      // collect (the leak class the distributed path's finally closes)
      try return driverComponents(symEdges).orderBy("id")
      finally symEdges.unpersist(false)
    }
    // the edge list is STATIC across rounds, and the per-round join keys
    // on dst — pre-partition on dst and CACHE (not checkpoint: an
    // InMemoryRelation keeps its HashPartitioning visible to the
    // planner, while a localCheckpoint's ExistingRDD reports
    // UnknownPartitioning), so every round's edges⋈labels join reuses
    // this one exchange and only the vertex-sized labels side ever
    // shuffles again. Measured (sf0.1 salted corpus, 1.9M symmetric
    // edges): the per-round edge reshuffle was the dominant round cost.
    val edges = symEdges.repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: the caches must be released on EVERY exit, including
    // the strict non-convergence throw below — the r11 form leaked the
    // persisted edge list for the rest of the session on that path
    try {
    // initial label = min(id, min direct neighbor): one aggregate that is
    // exactly the first propagation round, so the loop starts a round ahead
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("comp"))
      .localCheckpoint(true)
    // the eager checkpoint above materialized `edges` (the repartitioned
    // copy) — the un-partitioned source cache is never read again, so
    // drop it now instead of carrying TWO full edge caches through every
    // propagation round
    symEdges.unpersist(false)
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
      // lazy checkpoint: prop feeds BOTH sides of the jump self-join —
      // without it the edges⋈labels subtree above would evaluate twice
      val prop = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint(false)
      // pointer jump (path halving): comp ← comp's own label. Labels only
      // ever decrease inside the component, so the jump never crosses a
      // component boundary — it accelerates convergence from O(diameter)
      // to O(log diameter) rounds, collapsing the long tail of rounds
      // that move a handful of labels (measured 7 → 4 rounds on the
      // sf0.1 salted corpus). One extra vertex-sized self-join per round.
      // lazy checkpoint: the convergence count below materializes it, so
      // each iteration is exactly one job
      val next = prop
        .join(prop.select(col("id").as("comp"), col("comp").as("jump")),
          Seq("comp"), "left")
        .select(col("id"), col("old"),
          least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
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
    // the returned labels are checkpointed (the convergence count
    // materialized them), so the cached edge lists can be dropped now
    labels.orderBy("id")
    } finally {
      edges.unpersist(false)
      symEdges.unpersist(false) // no-op if already dropped above
    }
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
