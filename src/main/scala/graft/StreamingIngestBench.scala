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
      stateMemBytes: Long, stateRowsCurve: Seq[Long],
      stateMemCurve: Seq[Long])

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Per-trigger wall seconds from a progress record. `durationMs` is a
    * java Map whose `triggerExecution` phase can be ABSENT on some
    * trigger shapes — the former bare `.get(...)` NPE'd there (r16
    * advice); the whole-batch duration is the honest fallback. */
  private def trigSecs(
      p: org.apache.spark.sql.streaming.StreamingQueryProgress): Double =
    Option(p.durationMs.get("triggerExecution"))
      .map(_.toDouble).getOrElse(p.batchDuration.toDouble) / 1000.0

  /** awaitTermination(timeout) returning false means the query is STILL
    * RUNNING — treating it like completion let a mid-batch stop flow a
    * silently truncated batch_secs record into the scaling gate (r16
    * advice). A timeout is a failed measurement, never a record. */
  private def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long, leg: String): Unit =
    if (!q.awaitTermination(timeoutMs)) {
      q.stop()
      throw new IllegalStateException(
        s"StreamingIngestBench $leg leg still running after ${timeoutMs} ms" +
          " — timed-out run discarded (would be a truncated record)")
    }

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
      println(s"[streamingest] state curves: rows=" +
        s"${r.stateRowsCurve.mkString(",")} mem=${r.stateMemCurve.mkString(",")}")
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
      awaitOrFail(q, 600000, "ingest")
      // recentProgress is a synchronous snapshot — no listener races;
      // AvailableNow appends a zero-row finalization trigger, dropped here
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val batchRows = prog.map(_.numInputRows)
      val batchSecs = prog.map(trigSecs)
      val dups = spark.read.parquet(s"$root/flags")
        .filter(col("is_duplicate")).count()

      // --- leg 2: SUSTAINED stateful windowed aggregation under RocksDB
      // (r16 verdict ask: the single-micro-batch reading said nothing
      // about per-batch drift). The events table is replayed as nBatches
      // equal-count chunks in EVENT-TIME order — one file per trigger —
      // so the watermark advances monotonically, closed windows evict,
      // and the per-batch seconds + state rows/bytes CURVES are the
      // bounded-state evidence. ---
      import org.apache.spark.sql.expressions.Window
      val evRaw = Tables.eventsRaw(spark, sfDir)
      // setup, not measured: one global sort into time-ordered chunks
      // (chunk i written before i+1, so mtime order = time order)
      val chunked = evRaw
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("b", ntile(nBatches).over(
          Window.orderBy(col("ts"), col("event_id"))))
        .localCheckpoint(true)
      for (i <- 1 to nBatches)
        chunked.filter(col("b") === i).drop("b")
          .coalesce(1).write.parquet(f"$root/events_in/c=$i%02d")
      // ts type peeked from the REWRITTEN chunks (the rewrite normalizes
      // any legacy nanos annotation to what Spark itself writes)
      val tsType = spark.read.parquet(s"$root/events_in")
        .schema("ts").dataType
      val ev = StreamingAlerts.replayEvents(spark, s"$root/events_in", tsType)
      val q2 = StreamingAlerts.windowedCounts(ev).writeStream
        .format("noop")
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt_state")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      awaitOrFail(q2, 600000, "stateful")
      val prog2 = q2.recentProgress.toSeq.filter(_.numInputRows > 0)
      val stateSecs = prog2.map(trigSecs)
      val rowsCurve = prog2.map(p =>
        if (p.stateOperators.isEmpty) 0L
        else p.stateOperators.map(_.numRowsTotal).max)
      val memCurve = prog2.map(p =>
        if (p.stateOperators.isEmpty) 0L
        else p.stateOperators.map(_.memoryUsedBytes).max)
      val stateRows = if (rowsCurve.isEmpty) 0L else rowsCurve.max
      val stateMem = if (memCurve.isEmpty) 0L else memCurve.max
      Result(batchRows, batchSecs, idxRows, dups, RocksProvider,
        stateSecs, stateRows, stateMem, rowsCurve, memCurve)
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
