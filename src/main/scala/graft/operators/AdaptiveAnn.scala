package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Concentration-aware ANN dial selection — the recall floor at scale
  * (SURVEY.md §2 similarity family, round-8 addition).
  *
  * The two index families each expose two honest operating points:
  * the DEFAULT constant-row dial (per-probe cost constant at any corpus
  * size; recall 1.0 where real neighbor structure exists, falling on
  * structureless background as the corpus outgrows the row budget) and
  * the WIDE constant-fraction dial (background recall held ≥0.7 at any
  * size; cost linear in the corpus). Neither is right universally —
  * which one a query needs depends on whether its true neighbors are
  * CONCENTRATED structure (near-dups, clusters) or background noise,
  * a property of the data the engine can measure instead of guess.
  *
  * The auto entry points run the cheap default probe first, then
  * escalate — per query, not per batch — exactly those queries whose
  * top-k came back indistinguishable from the corpus's background
  * cosine distribution ([[concentrated]] is the pinned rule). A planted
  * or clustered query pays the constant default cost and nothing else;
  * a background query pays one additional wide probe, the price its
  * answer actually costs (no constant-cost index can surface an
  * unconcentrated top-k — the information simply is not in any bounded
  * candidate set). At 100 TB the escalation set is the contract: junk
  * answers are upgraded for linear cost only where junk was measured,
  * and the background statistics come from one driver-tiny seeded
  * sample, not a corpus pass. */
object AdaptiveAnn {

  /** Escalation z-score: a top-k hit counts as structure when its cosine
    * clears μ + 5σ of the sampled background pair distribution. The
    * extreme-value yardstick: the best of the ~n·k background candidates
    * a probe can surface sits near μ + 4σ for corpora up to ~10⁶ docs
    * (max of m Gaussian draws ≈ √(2·ln m)·σ), so 5σ is clear of what
    * background CAN produce while far below real near-dup structure
    * (a ±2% jittered duplicate scores ≈ μ + 8σ on 64-dim data). */
  val EscalationZ: Double = 5.0

  /** A query's default answer is kept when at least half its k hits
    * clear the [[EscalationZ]] band — half, not all, so a query with
    * genuine-but-partial structure (fewer than k true neighbors) is
    * not escalated for the crime of an honest tail. */
  val MinStructuredFraction: Double = 0.5

  /** Ceiling on the escalation band: low-dimensional corpora have wide
    * background distributions (σ ≈ 1/√dim), and μ + 5σ can exceed
    * cosine's own range — demanding the impossible and escalating
    * everything. Near-duplicate structure sits at ≥0.9 at ANY dimension
    * (a ±2% jitter costs ~2·10⁻⁴ of cosine), so the band never needs to
    * rise past it. */
  val StructureCosineCap: Double = 0.9

  /** The escalation band: min(μ + [[EscalationZ]]·σ, [[StructureCosineCap]]). */
  private[graft] def escalationBand(mu: Double, sigma: Double): Double =
    math.min(mu + EscalationZ * sigma, StructureCosineCap)

  /** Sampled vectors behind the background (μ, σ) estimate: 128 vectors
    * = 8128 deterministic pairs, one driver-collected job. */
  private val StatsSampleVectors = 128

  /** Corpus size above which the constant-row dial's BACKGROUND recall
    * has measured decay (RecallGrid: IVF 0.70 → 0.28, LSH 0.79 → 0.52
    * between the 10⁴-row and 10⁵-row corpora) — the advisory threshold
    * sits at the midpoint so the measured-good scale stays quiet and the
    * measured-decayed scale warns. Concentrated/planted neighbors are
    * unaffected at any size (recall 1.0 on both dials). */
  val ConstantDialAdvisoryRows: Long = 50000L

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.AdaptiveAnn")

  /** True while an auto entry point is building its probes — the auto
    * path IS the cliff's fix, so its internal constant-dial probe must
    * not re-warn about the problem it exists to solve. */
  private val inAuto = new scala.util.DynamicVariable[Boolean](false)

  private[graft] def suppressAdvisory[T](f: => T): T = inAuto.withValue(true)(f)

  /** The pure decision behind the constant-dial advisory (specced):
    * advise iff the corpus is past [[ConstantDialAdvisoryRows]] and the
    * caller is not already inside an auto entry point. Explicit dials
    * never reach this — a caller who chose planes/nprobe chose their
    * operating point. */
  private[graft] def adviseDecision(corpusRows: Long): Boolean =
    !inAuto.value && corpusRows > ConstantDialAdvisoryRows

  /** Driver-side advisory, once per plan build (called from the auto-dial
    * resolvers): the documented decision (docs/indexes.md, "Which entry
    * point") is that the plain constant-row entry points stay the
    * constant-cost fast path — and this warning is what keeps their
    * background-recall decay from ever being SILENT at scale. */
  def adviseConstantDial(family: String, corpusRows: Long): Unit =
    if (adviseDecision(corpusRows))
      log.warn(s"$family constant-row dial on a ~$corpusRows-row corpus: " +
        "background recall decays at this scale (measured IVF 0.70 -> 0.28 " +
        "per 10x rows; planted/concentrated neighbors unaffected). For " +
        "unknown query mixes use AdaptiveAnn.lshTopKBatchAuto / " +
        "ivfTopKBatchAuto (per-query escalation), or opt into the wide " +
        "dial (planes = 5 / Ivf.wideNprobe) — see docs/indexes.md.")

  /** The dial-selection rule, pure and pinned by spec: keep the default
    * answer iff ≥ ⌈[[MinStructuredFraction]]·k⌉ of its cosines clear
    * μ + [[EscalationZ]]·σ. An under-filled result (fewer than the
    * required hits, e.g. zero bucket collisions) always escalates. */
  private[graft] def concentrated(cosines: Seq[Double], k: Int,
      mu: Double, sigma: Double): Boolean = {
    val need = math.ceil(k * MinStructuredFraction).toInt
    cosines.count(_ >= escalationBand(mu, sigma)) >= need
  }

  /** Background cosine (μ, σ) from a deterministic stride sample:
    * [[StatsSampleVectors]] vectors at a fixed id stride, all pairwise
    * cosines computed on the driver (≤ 8128 doubles — no corpus pass,
    * no shuffle, stable across runs on the same corpus). */
  private[graft] def backgroundStats(embeddings: DataFrame,
      corpusSize: Long = 0L): (Double, Double) = {
    val n = if (corpusSize > 0L) corpusSize else embeddings.count()
    val stride = math.max(1L, n / StatsSampleVectors)
    val ids = (0L until math.min(StatsSampleVectors.toLong, n)).map(_ * stride)
    val vecs = embeddings.filter(col("vec_id").isin(ids: _*))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val cos = for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
    } yield {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var t = 0
      while (t < math.min(vecs(i).length, vecs(j).length)) {
        d += vecs(i)(t).toDouble * vecs(j)(t).toDouble
        na += vecs(i)(t).toDouble * vecs(i)(t).toDouble
        nb += vecs(j)(t).toDouble * vecs(j)(t).toDouble
        t += 1
      }
      d / math.sqrt(na * nb)
    }
    val xs = cos.toArray
    val mu = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
    (mu, sigma)
  }

  /** The per-query escalation decision over a collected phase-1 result:
    * query ids whose default top-k failed [[concentrated]]. Query ids
    * with NO phase-1 rows at all (no collisions) are included too. */
  private[graft] def escalationSet(phase1: Array[Row], queryIds: Seq[Long],
      k: Int, mu: Double, sigma: Double): Set[Long] = {
    val byQ = phase1.groupBy(_.getLong(0))
    queryIds.filter { q =>
      !concentrated(byQ.getOrElse(q, Array.empty[Row])
        .map(_.getDouble(3)).toSeq, k, mu, sigma)
    }.toSet
  }

  /** Shared two-phase driver: collect the default batch probe, keep the
    * concentrated queries' rows as a local DataFrame, re-probe the rest
    * wide, union. Output schema/ordering match the batch probes. */
  private def adaptive(spark: SparkSession, queryIds: Seq[Long], k: Int,
      mu: Double, sigma: Double, defaultProbe: => DataFrame,
      wideProbe: Seq[Long] => DataFrame): DataFrame = suppressAdvisory {
    val p1 = defaultProbe
    val rows = p1.collect()
    val esc = escalationSet(rows, queryIds, k, mu, sigma)
    val kept = spark.createDataFrame(
      java.util.Arrays.asList(rows.filterNot(r => esc(r.getLong(0))): _*),
      p1.schema)
    val out =
      if (esc.isEmpty) kept
      else kept.unionByName(wideProbe(esc.toSeq.sorted))
    out.orderBy(col("q_id"), col("cosine").desc, col("vec_id"))
  }

  /** LSH batched probe with the concentration-escalation contract:
    * default 24-table constant-occupancy probe, per-query wide (5-plane
    * constant-fraction) re-probe where the default answer measured as
    * background. Runs two actions (the stats sample and the phase-1
    * collect) — the ANN-service shape where results are consumed, not
    * composed. */
  def lshTopKBatchAuto(embeddings: DataFrame, queryIds: Seq[Long], k: Int,
      tables: Int = 24, corpusSize: Long = 0L): DataFrame = {
    val (mu, sigma) = backgroundStats(embeddings, corpusSize)
    adaptive(embeddings.sparkSession, queryIds, k, mu, sigma,
      AnnLsh.topKBatch(embeddings, queryIds, k, tables),
      esc => AnnLsh.topKBatch(embeddings, esc, k, tables, planes = 5))
  }

  /** IVF batched probe with the concentration-escalation contract:
    * default row-budget nprobe, per-query [[Ivf.wideNprobe]] re-probe
    * where the default answer measured as background. */
  def ivfTopKBatchAuto(embeddings: DataFrame, centroids: Array[Array[Float]],
      queryIds: Seq[Long], k: Int, corpusSize: Long = 0L): DataFrame = {
    val (mu, sigma) = backgroundStats(embeddings, corpusSize)
    adaptive(embeddings.sparkSession, queryIds, k, mu, sigma,
      Ivf.topKBatch(embeddings, centroids, queryIds, k),
      esc => Ivf.topKBatch(embeddings, centroids, esc, k,
        nprobe = Ivf.wideNprobe(centroids.length)))
  }
}
