package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup
import graft.sources.Tables

/** Per-batch cost telemetry for the incremental-ingest loop — the
  * operational claim behind IncrementalDedup.streamingIngest measured,
  * not argued: N constant-size micro-batches are probed against and
  * appended to a GROWING signature index (each timed cycle is exactly
  * the foreachBatch body: open index → dedupAgainst → write flags →
  * append clean signatures), so the emitted per-batch seconds pin the
  * slope as the index grows. The design says per-batch cost is
  * O(batch + collisions) plus one signature-index scan — near-flat while
  * the index multiplies in size; a visibly rising slope here flags a
  * corpus re-tokenization or self-join sneaking into the path.
  *
  * The initial corpus is the SMALL residue class (doc_id % 5 == 0) so
  * the appended batches multiply the index several times over within one
  * sf dir — maximum growth signal from the fixed test data. */
object IngestBench {

  final case class Result(batchRows: Seq[Long], batchSecs: Seq[Double],
      indexRows: Seq[Long])

  def run(spark: SparkSession, sfDir: String, nBatches: Int = 8,
      threshold: Double = 0.9): Result = {
    val docs = Tables.documents(spark, sfDir).localCheckpoint(true)
    val corpus = docs.filter(col("doc_id") % 5 === 0)
    val rest = docs.filter(col("doc_id") % 5 =!= 0)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val step = (maxId + nBatches) / nBatches
    val pathDir = java.nio.file.Files.createTempDirectory("graft-ingest-bench")
    val path = pathDir.toString
    try {
      IncrementalDedup.saveSignatures(corpus, path)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
      val secs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val idxRows = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (i <- 0 until nBatches) {
        // the batch is materialized OUTSIDE the timing — arrival cost
        // belongs to the source, not the ingest cycle under measurement
        val batch = rest.filter(col("doc_id") >= i.toLong * step &&
          col("doc_id") < (i + 1).toLong * step).localCheckpoint(true)
        val t0 = System.nanoTime()
        val idx = IncrementalDedup.openSignatures(spark, path)
        val flagged = IncrementalDedup.dedupAgainst(idx, batch, threshold)
          .localCheckpoint(true)
        flagged.write.mode("append").parquet(s"$path/flags")
        IncrementalDedup.appendSignatures(idx, batch.join(
          flagged.filter(!col("is_duplicate")).select("doc_id"), "doc_id"))
        secs += (System.nanoTime() - t0) / 1e9
        rows += batch.count()
        idxRows += spark.read.parquet(s"$path/sigs").count()
      }
      Result(rows.toSeq, secs.toSeq, idxRows.toSeq)
    } finally {
      // the scratch index is a full corpus signature set plus per-batch
      // appends — left behind on every bench run it would accumulate
      // unbounded parquet data in the temp filesystem
      org.apache.commons.io.FileUtils.deleteQuietly(pathDir.toFile)
      ()
    }
  }
}
