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

  /** [[detectAll]] with the events scan SHARED across the detector
    * union. The four rules need four different window exchanges (r7
    * audit: threshold rides the rolling-feature windows, consecutive
    * partitions by (user, exceeds), oscillation by user with its own
    * frame, zscore aggregates — provably unsharable), but they do NOT
    * need five reads of the events table: the RAW events frame is
    * checkpointed once (lazy localCheckpoint — computed with the first
    * action, then block storage) and every rule, plus the rolling-
    * feature derivation the threshold rule consumes, reads those
    * blocks. At 100 TB that is one corpus read instead of five; the
    * executed union plan contains zero parquet scans (pinned in
    * PlanQualitySpec). Sharing the RAW scan, not the rolling-features
    * frame, is deliberate: the rolling windows are the union's most
    * expensive compute, and routing the three raw-events rules through
    * them would trade a cheap re-scan for an expensive recompute
    * (measured 1.5× slower at sf1). Row-identical to
    * `detectAll(events, rollingFeatures(events))`. */
  def detectAllShared(spark: SparkSession, dir: String): DataFrame = {
    // r21 (VERDICT r20 item 4, attempt 2): the checkpointed events frame
    // is REPARTITIONED on user_id and SORTED (user_id, ts_us, event_id)
    // BEFORE materialization. Dataset.localCheckpoint captures the
    // physical plan's outputPartitioning/outputOrdering into the
    // LogicalRDD, so every rule's window sees its distribution
    // requirement already satisfied by the checkpoint: the rolling
    // windows and oscillation need exactly this (partitioning, ordering)
    // pair; consecutive's (user_id, exceeds)/(user_id, grp) windows are
    // clustered by the user_id hash (subset property — no exchange, just
    // an in-partition re-sort); zscore's groupBy(user_id) aggregates in
    // ONE complete pass with no exchange. Net: the four per-rule
    // exchanges of the r7–r20 plan collapse into the checkpoint's single
    // exchange (ad_all_rules executed plan: 5 Exchange → 2 — the
    // checkpoint's own hash exchange + the final presentation sort's
    // range exchange; plans/r21/ad_all_rules_{before,after}.txt). The r20
    // attempt failed because a bare repartition WITHOUT the checkpoint
    // boundary let column pruning push branch projections below it and
    // ReuseExchange never fired; the RDD boundary is opaque to pruning,
    // so the partitioning survives into all four branches. Row-identical:
    // repartition+sort only permutes input order, and every rule's
    // windows/aggregates are keyed on the same user_id axis (oracle-gated).
    // AQE is disabled for the checkpoint's own (scan→exchange→sort) plan:
    // AdaptiveSparkPlanExec reports UnknownPartitioning before execution,
    // so a checkpoint built under AQE LOSES the partitioning metadata the
    // whole scheme exists to carry (measured: every branch re-exchanged).
    // Conf-scoped save/restore, the Tables.tableAdaptive precedent; the
    // downstream rule queries still plan under the session's AQE setting.
    val adaptiveBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val events =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        TimeSeries.base(spark, dir)
          .repartition(col("user_id"))
          .sortWithinPartitions("user_id", "ts_us", "event_id")
          .localCheckpoint(false)
      } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveBefore)
    detectAll(events, TimeSeries.rollingFeaturesUnsorted(events))
  }

  /** All four rule detectors, unioned on the standard schema
    * (models.py:377 runs rules + ML and concatenates). Composes the
    * UNSORTED rule cores: each rule's public form carries a global
    * presentation sort that EliminateSorts cannot remove from inside a
    * union branch, so the sorted forms here cost four rangepartitioning
    * exchanges whose order the final orderBy (or a consumer's
    * aggregate) immediately destroys (r13 audit; the union plan's
    * sortlessness below the top is pinned in PlanQualitySpec). */
  def detectAll(events: DataFrame, features: DataFrame): DataFrame = {
    val threshold = standardize(
      AnomalyRules.thresholdAlertsUnsorted(features), col("score"))
    val consecutive = standardize(
      AnomalyRules.consecutiveRunsUnsorted(events), col("run_len").cast("double"))
    val oscillation = standardize(
      AnomalyRules.oscillationUnsorted(events), col("n_changes").cast("double"))
    val zscore = standardize(
      AnomalyRules.zscoreAlertsUnsorted(events), col("zscore"))
    threshold.unionByName(consecutive).unionByName(oscillation).unionByName(zscore)
      .orderBy("rule_name", "user_id", "ts_us", "event_id")
  }

  /** Per-feature describe()-style summary (count/mean/std/min/max/median)
    * in long format, one row per numeric feature — the
    * `describe().T` sidecar the reference ETL writes next to the processed
    * frame (pipeline_batch.py:184-189). One explode + one aggregate: a
    * single shuffle keyed on the (bounded) feature-name column. */
  def featureSummary(features: DataFrame, numericCols: Seq[String]): DataFrame = {
    val long = features.select(explode(array(numericCols.map(c =>
      struct(lit(c).as("feature"), col(c).cast("double").as("v"))): _*)).as("fv"))
      .select(col("fv.feature").as("feature"), col("fv.v").as("v"))
    long.groupBy("feature")
      .agg(
        count(col("v")).as("n"),
        avg(col("v")).as("mean"),
        stddev_samp(col("v")).as("std"),
        min(col("v")).as("min"),
        percentile_approx(col("v"), lit(0.5), lit(10000)).as("median"),
        max(col("v")).as("max"))
      .orderBy("feature")
  }

  /** ETL entry point: events → cleaned + feature frame, persisted, with
    * the per-feature summary sidecar (pipeline_batch.py:184-191). Returns
    * the feature frame. */
  def runEtl(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    val features = TimeSeries.rollingFeatures(TimeSeries.base(spark, dir))
    features.write.mode("overwrite").parquet(outPath)
    featureSummary(features,
      Seq("value", "mean_3", "std_3", "mean_12", "std_12"))
      .write.mode("overwrite").parquet(outPath + "_summary")
    features
  }

  /** Dataset-assembly capstone — the full training-data recipe as ONE
    * composed pipeline, mirroring the reference's orchestration pattern
    * (src/pipeline_batch.py:191 `run_etl_pipeline`: stage composition
    * behind a single entry point) for the LLM-data side of the engine:
    *
    *   curate → mix-to-target → epoch plan → global shuffle → pack
    *
    * Every stage is the SAME public operator the staged `ds_*`/`tx_*`
    * query keys run (TextAnalysis.curateKeep, Sampling.mixToTarget,
    * Sampling.epochPlan, Sampling.shuffleInstances,
    * Packing.assignSequences), so the composed output is row-identical
    * to chaining the staged keys by hand (specced), and the DuckDB
    * oracle replays the whole recipe bit-for-bit — all integer
    * arithmetic after the curation gate.
    *
    * The unit flowing out of the epoch stage is a (doc, epoch)
    * INSTANCE; its synthetic id `doc_id·(maxEpochs+1) + epoch` is
    * distinct per instance and monotone, so the Lehmer shuffle
    * separates a document's repetitions across shards (what a training
    * loader wants: the ×3-epoch book should not appear three times in a
    * row).
    *
    * Precondition: the synthetic id shrinks the usable Lehmer domain by
    * (maxEpochs+1)× — every doc_id surviving curation+mixing must be
    * < (2³¹−2)/(maxEpochs+1), or sampleKey's raise_error fires loudly at
    * runtime. Corpora with wider or sparse ids should densify first
    * (dense_rank / zipWithIndex — see the densify-first guidance on
    * [[graft.operators.Sampling.sampleKey]]).
    *
    * Scale shape: curation + mixing are scan-side predicates (the
    * corpus never shuffles); the epoch explode is scan-side row
    * generation; the ONE real exchange is the partition-by-shard the
    * shard write needs anyway, shared by the shuffle window, the pack
    * prefix-sum, and [[graft.operators.Sampling.writeShards]]. Token
    * counts ride a narrow (doc_id, n_tokens) join — two longs per doc,
    * not the text. */
  def assembleDataset(documents: DataFrame, weights: Map[String, Int],
      budget: Long, maxEpochs: Int = 4, nShards: Int = 16,
      packBudget: Long = 2048): DataFrame = {
    // the curation gate is the chain's expensive per-row compute (four
    // regex counts + two repetition mode scans), and the mixture/epoch
    // stages reference their input several times (per-source counts,
    // T*, rates, the selection join) — without a materialization those
    // references re-run the gate once EACH (measured 6.5 s vs 1.3 s at
    // sf0.1). Lazy checkpoint: every reference shares one computed RDD,
    // the production shape (a real pipeline persists its curated
    // corpus; the staged-equality spec is unaffected — same rows).
    val curated = TextAnalysis.curateKeep(documents).localCheckpoint(false)
    val mixed = Sampling.mixToTarget(curated, weights)
    // mixToTarget's telemetry columns would collide with epochPlan's
    // internal plan columns of the same name — the chain hands over
    // only the corpus identity (doc_id, source, …)
    val eps = Sampling.epochPlan(mixed.drop("rate_ppm", "sample_key"),
      weights, budget, maxEpochs)
    // token counts join BEFORE the shuffle window, so the ONE
    // hashpartitioning(shard) exchange serves both the pos window and
    // the pack prefix-sum (same partitioning → Spark reuses it; pinned
    // in AssemblySpec) — joining after would re-exchange on shard.
    // The counter is TextAnalysis.tokenCount — the same expression
    // tx_tokens/tx_pack bill with, so "token budget" is one unit
    // engine-wide (specced in AssemblySpec).
    val toks = documents.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val mult = maxEpochs.toLong + 1L
    val inst = eps.join(toks, Seq("doc_id")).withColumn("instance_id",
      col("doc_id") * lit(mult) + col("epoch"))
    val shuffled = Sampling.shuffleInstances(inst, "instance_id", nShards)
    Packing.assignSequences(shuffled, packBudget, orderCol = "pos")
      .select("doc_id", "source", "epoch", "instance_id", "shard", "pos",
        "n_tokens", "start_tok", "seq_id", "seq_offset", "n_seqs")
      .orderBy("doc_id", "epoch")
  }

  /** [[assembleDataset]] + the shard write: assemble, lay the result
    * down as `shard=…/` parquet directories in permutation order
    * (Sampling.writeShards — the one exchange), and return the
    * assembled frame for inspection. */
  def assembleAndWrite(documents: DataFrame, weights: Map[String, Int],
      budget: Long, path: String, maxEpochs: Int = 4, nShards: Int = 16,
      packBudget: Long = 2048): DataFrame = {
    val assembled = assembleDataset(documents, weights, budget, maxEpochs,
      nShards, packBudget)
    Sampling.writeShards(assembled, path)
    assembled
  }

  /** The WHOLE training-data path from raw files to training shards —
    * front door to capstone in one call: each named corpus directory is
    * ingested ([[graft.sources.Tables.ingestTextDir]], one file = one
    * document, the corpus label as `source`), the union is densified
    * into the Lehmer domain ([[Sampling.densifyIds]] ordered by the
    * unique file path — deterministic across runs and partition
    * layouts), and [[assembleAndWrite]] runs the full curate → mix →
    * epochs → shuffle → pack recipe and lays the shards down.
    *
    * This is the "switch your corpus to this engine" entry point: raw
    * text directories in, replayable training shards out, every stage
    * the same specced operator its query key runs. Scale shape: the
    * ingest is a distributed file scan per corpus; densify is the
    * sorted zipWithIndex (no single-partition stage); the assembly
    * tail is the capstone's one shared shard exchange. */
  def ingestAndAssemble(spark: SparkSession, corpora: Map[String, String],
      weights: Map[String, Int], budget: Long, path: String,
      maxEpochs: Int = 4, nShards: Int = 16,
      packBudget: Long = 2048): DataFrame =
    ingestAndAssembleFrom(spark,
      corpora.map { case (src, dir) =>
        src -> (graft.sources.Tables.TextDir(dir): graft.sources.Tables.CorpusDir)
      },
      weights, budget, path, maxEpochs, nShards, packBudget)

  /** [[ingestAndAssemble]] over format-tagged corpus directories — mixes
    * raw-text corpora with compressed-JSONL ones (the HF-export shape)
    * in one assembly: each source ingests through its format's front
    * door, everything downstream is identical. The densify order is
    * (path, doc_id): unique for one-doc-per-file text corpora (path
    * alone was the pre-r14 order — same total order, no behavior
    * change) and total for many-docs-per-file JSONL, where doc_id
    * breaks the within-file tie deterministically. */
  def ingestAndAssembleFrom(spark: SparkSession,
      corpora: Map[String, graft.sources.Tables.CorpusDir],
      weights: Map[String, Int], budget: Long, path: String,
      maxEpochs: Int = 4, nShards: Int = 16,
      packBudget: Long = 2048): DataFrame = {
    require(corpora.nonEmpty, "corpora must name at least one directory")
    // fail fast on label drift: mixToTarget silently drops sources with
    // no weight (null-weight filter) — here that would mean a whole
    // INGESTED corpus vanishing from the shards over a typo'd key
    require(corpora.keySet == weights.keySet,
      s"corpora labels ${corpora.keySet.toSeq.sorted.mkString(",")} must " +
        s"match weight keys ${weights.keySet.toSeq.sorted.mkString(",")}")
    val raw = corpora.toSeq.sortBy(_._1)
      .map {
        case (src, graft.sources.Tables.TextDir(dir)) =>
          graft.sources.Tables.ingestTextDir(spark, dir, src)
        case (src, graft.sources.Tables.JsonlDir(dir, tf, idf)) =>
          graft.sources.Tables.ingestJsonlDir(spark, dir, src, tf, idf)
      }
      .reduce(_.unionByName(_))
    // materialize the densified corpus: assembleDataset references its
    // input from several branches (the curate gate's checkpoint action,
    // the token join, the shard write) — cheap re-scans for a parquet
    // table, but HERE the lineage is the whole-directory file scan
    // plus the densify sort, which must run once, not once per branch
    val dense = Sampling.densifyIds(raw, orderCols = Seq("path", "doc_id"))
      .drop("doc_id", "path")
      .withColumnRenamed("dense_id", "doc_id")
      .localCheckpoint(false)
    assembleAndWrite(dense, weights, budget, path, maxEpochs, nShards,
      packBudget)
  }

  /** The ONLINE front half of the assembly recipe, as a per-micro-batch
    * `prepare` for IncrementalDedup.streamingIngest: curation gate →
    * per-source mixture rates, both pure per-row predicates, so each
    * micro-batch stays single-pass and a REPLAYED batch (checkpoint
    * recovery) selects exactly the same rows — the determinism that
    * makes the streaming loop equal its batch twin (specced). Chain it
    * with streamingIngest's built-in dedup+append and the loop is
    * curate → sample → dedup → append: the online form of
    * [[assembleDataset]]'s front stages feeding a continuously-growing
    * deduped corpus (shuffle/pack stay batch passes over the
    * accumulated corpus — they need global state no single micro-batch
    * has). */
  def ingestPrepare(rates: Map[String, Int], defaultPct: Int = 10)
      : DataFrame => DataFrame = batch =>
    Sampling.stratifiedKeep(TextAnalysis.curateKeep(batch), rates, defaultPct)
      .drop("sample_key", "sample_pct")

  /** Detection entry point: detectors over the feature frame, alerts
    * persisted to the day-partitioned store (models.py:377). */
  def runDetection(spark: SparkSession, dir: String, storePath: String): DataFrame = {
    val alerts = detectAllShared(spark, dir)
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

  /** Range scan with optional severity / rule / entity filters — the
    * query_anomalies shape (db.py:113, each filter independently
    * optional); the day predicate hits only the matching partitions. */
  def queryRange(spark: SparkSession, path: String, startDay: Long,
      endDay: Long, severity: Option[String] = None,
      ruleName: Option[String] = None, userId: Option[Long] = None,
      limit: Int = 100): DataFrame = {
    val preds = Seq(
      Some(col("epoch_day") >= startDay && col("epoch_day") <= endDay),
      severity.map(col("severity") === _),
      ruleName.map(col("rule_name") === _),
      userId.map(col("user_id") === _)).flatten
    preds.foldLeft(read(spark, path))(_ filter _)
      .orderBy(col("ts_us").desc, col("event_id"))
      .limit(limit)
  }

  /** Mandatory-severity convenience form (round-1 signature). */
  def queryRange(spark: SparkSession, path: String, startDay: Long,
      endDay: Long, severity: String, limit: Int): DataFrame =
    queryRange(spark, path, startDay, endDay, Some(severity), None, None, limit)

  /** Retention/maintenance: drop whole day partitions in
    * [startDay, endDay] — the `clear_anomalies` analog (db.py:239; the
    * reload path db.py:250 is simply `append` after a clear). Deletes are
    * partition-directory drops on the day-partitioned lake: no rewrite of
    * surviving data, O(partitions-in-range) filesystem calls regardless of
    * row volume. Returns the number of partitions removed. */
  def clearRange(spark: SparkSession, path: String, startDay: Long,
      endDay: Long): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0L
    else fs.listStatus(root).iterator
      .filter(_.getPath.getName.startsWith("epoch_day="))
      .filter { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("epoch_day=").toLong)
          .toOption.exists(d => d >= startDay && d <= endDay)
      }
      .count(st => fs.delete(st.getPath, true)).toLong
  }
}
