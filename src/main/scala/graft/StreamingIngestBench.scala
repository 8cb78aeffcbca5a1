package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup
import graft.sources.Tables
import graft.streaming.StreamingAlerts

/** The STREAMING scale record (r15 verdict ask #6): the foreachBatch
  * ingest loop ([[graft.operators.IncrementalDedup.streamingIngest]])
  * driven as a real Structured Streaming query — file source,
  * maxFilesPerTrigger=1, AvailableNow — against a corpus-sized signature
  * index, with per-micro-batch seconds read from the query's own
  * progress records; plus a STATEFUL leg (the windowed-count aggregation
  * behind st_window_agg) run under the RocksDB state-store provider so
  * the scale record carries real state-store metrics, not just
  * wall-clock.
  *
  * The batch-mode twin ([[IngestBench]]) times the foreachBatch BODY in
  * isolation; this measures the same cycle under the streaming runtime —
  * trigger scheduling, checkpoint commits, file-source listing — which
  * is what a production ingest actually pays. Near-flat batch_secs
  * across a run (and across sf dirs at constant batch size) is the
  * sub-linear-probe claim in its streaming form.
  *
  * Usage: runMain graft.StreamingIngestBench <sfDir> — or via Bench,
  * which emits the result as the `ingest_streaming` JSON block.
  */
object StreamingIngestBench {

  final case class Result(batchRows: Seq[Long], batchSecs: Seq[Double],
      indexRows: Long, flaggedDups: Long, provider: String,
      stateBatchSecs: Seq[Double], stateRowsTotal: Long,
      stateMemBytes: Long)

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, sfDir)
      println(s"[streamingest] rows=${r.batchRows.mkString(",")}")
      println(s"[streamingest] secs=${r.batchSecs.map(s => f"$s%.2f").mkString(",")}")
      println(s"[streamingest] index=${r.indexRows} dups=${r.flaggedDups}")
      println(s"[streamingest] state: provider=${r.provider} " +
        s"rows=${r.stateRowsTotal} mem=${r.stateMemBytes} " +
        s"secs=${r.stateBatchSecs.map(s => f"$s%.2f").mkString(",")}")
    } finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, nBatches: Int = 8,
      threshold: Double = 0.9): Result = {
    val docs = Tables.documents(spark, sfDir).localCheckpoint(true)
    val n = docs.count()
    // the same fixed-batch geometry as IngestBench: 500-doc batches, the
    // corpus (everything above the batch pool) is the signed index
    val bs = math.max(1L, math.min(IngestBench.BatchSize, n / 10L))
    val pool = bs * nBatches
    val rootDir = java.nio.file.Files.createTempDirectory("graft-stream-ingest")
    val root = rootDir.toString
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val oldProvider = spark.conf.getOption(confKey)
    try {
      IncrementalDedup.saveSignatures(docs.filter(col("doc_id") >= pool),
        s"$root/index", parts = 256, sigParts = 64)
      val idxRows = IncrementalDedup.openSignatures(spark, s"$root/index")
        .sigs.count()
      // one parquet file per micro-batch; maxFilesPerTrigger=1 makes the
      // file source deliver them one trigger each (arrival ORDER between
      // same-mtime files is not asserted — per-batch cost, not batch
      // identity, is what this measures)
      for (i <- 0 until nBatches)
        docs.filter(col("doc_id") >= i * bs && col("doc_id") < (i + 1) * bs)
          .select("doc_id", "text")
          .coalesce(1).write.parquet(s"$root/incoming/b=$i")
      spark.conf.set(confKey, RocksProvider)

      // --- leg 1: the foreachBatch ingest loop (stateless sink; the
      // provider conf rides along so the whole record is one regime) ---
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(s"$root/incoming")
      val q = IncrementalDedup.streamingIngest(stream, s"$root/index",
        s"$root/flags", s"$root/ckpt", threshold)
      q.awaitTermination(600000)
      if (q.isActive) q.stop()
      // recentProgress is a synchronous snapshot — no listener races;
      // AvailableNow appends a zero-row finalization trigger, dropped here
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val batchRows = prog.map(_.numInputRows)
      val batchSecs = prog.map(p =>
        p.durationMs.get("triggerExecution").toDouble / 1000.0)
      val dups = spark.read.parquet(s"$root/flags")
        .filter(col("is_duplicate")).count()

      // --- leg 2: stateful windowed aggregation over the events table
      // under RocksDB — the state-store metrics half of the record ---
      val ev = StreamingAlerts.readEvents(spark, sfDir)
      val q2 = StreamingAlerts.windowedCounts(ev).writeStream
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt_state")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q2.awaitTermination(600000)
      if (q2.isActive) q2.stop()
      val prog2 = q2.recentProgress.toSeq.filter(_.numInputRows > 0)
      val stateSecs = prog2.map(p =>
        p.durationMs.get("triggerExecution").toDouble / 1000.0)
      val stateOps = prog2.flatMap(_.stateOperators.toSeq)
      val stateRows =
        if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max
      val stateMem =
        if (stateOps.isEmpty) 0L else stateOps.map(_.memoryUsedBytes).max
      Result(batchRows, batchSecs, idxRows, dups, RocksProvider,
        stateSecs, stateRows, stateMem)
    } finally {
      oldProvider match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(rootDir.toFile)
      ()
    }
  }
}
