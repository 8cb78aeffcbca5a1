package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (batch-vs-corpus) near-duplicate detection over a
  * PERSISTED MinHash signature index — the shape a production ingest
  * pipeline actually runs: the historical corpus is signed ONCE, each new
  * crawl batch is signed at its own (small) size and joined against the
  * stored signatures, so per-batch cost is O(batch + collisions), never a
  * corpus re-tokenization and never corpus×corpus work.
  *
  * Reference analog: the reference dedups only within one static frame
  * (pandas `duplicated()`); this is the scale extension of that surface
  * (SURVEY §2 dd_*), reusing MinHashLsh's signature family so estimates
  * agree bit-for-bit with the batch path.
  *
  * Scale design:
  *   - The batch side (signatures + exploded band buckets) is BROADCAST;
  *     the stored corpus signatures stream through one scan with no
  *     shuffle and no self-join — the bipartite candidate volume is
  *     Σ_buckets |corpus ∩ bucket|·|batch ∩ bucket|, linear in bucket
  *     collisions (the self-join's m² hub blow-up cannot happen here).
  *   - (corpus, batch) pairs colliding in several bands are kept only at
  *     the FIRST agreeing band — the same carried-bucket-array first-agree
  *     as MinHashLsh.bandedPairs, flat codegen arithmetic, no distinct
  *     over the candidate stream.
  *   - The duplicate decision is the k-minhash agreement estimate
  *     (LongArrayMatchCount / k ≥ threshold): signatures alone decide, so
  *     the index stores ~1 KB/doc and raw text is never read again.
  *     σ ≈ √(j(1−j)/k) ≈ 0.03 at k=128 near j=0.9; callers needing exact
  *     verification re-check flagged pairs against stored tokens.
  *   - Intra-batch duplicates are out of scope by design (run
  *     MinHashLsh.exactPairs / Dedup.clusterExact within the batch);
  *     composing both is the standard two-step ingest dedup.
  */
object IncrementalDedup {

  /** An opened signature index: (doc_id, sig, bkts) rows plus the
    * signature/banding parameters they were built with. */
  final case class SigIndex(sigs: DataFrame, path: String, k: Int, bands: Int)

  /** (doc_id, sig, bkts): signatures plus per-doc band bucket array,
    * computed by the SAME kernels as the self-join path. */
  private def signed(documents: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    MinHashLsh.signatures(documents, k)
      .withColumn("bkts", org.apache.spark.sql.graft.ColumnBridge
        .bandBuckets(col("sig"), bands, rows))
  }

  /** Sign `documents` once and persist the index under `path`. The
    * signing parameters ride a versioned JSON sidecar (`params.json`,
    * portable across JVM versions — see IndexMeta). */
  def saveSignatures(documents: DataFrame, path: String, k: Int = 128,
      bands: Int = 16): Unit = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    signed(documents, k, bands)
      .write.mode("overwrite").parquet(s"$path/sigs")
    IndexMeta.writeParams(documents.sparkSession, path,
      Map("k" -> k, "bands" -> bands))
  }

  /** Open an index written by [[saveSignatures]]. A pre-v1 index
    * (Java-serialized `params.bin`) is rejected with a rebuild message. */
  def openSignatures(spark: SparkSession, path: String): SigIndex = {
    val ps = IndexMeta.readParams(spark, path, Seq("k", "bands"))
    SigIndex(spark.read.parquet(s"$path/sigs"), path, ps("k"), ps("bands"))
  }

  /** Sign `newDocs` with the index's own parameters and APPEND them —
    * the accept step of the ingest loop (dedup the batch, then append the
    * survivors so the next batch sees them). Reopen to read the new rows. */
  def appendSignatures(index: SigIndex, newDocs: DataFrame): Unit =
    signed(newDocs, index.k, index.bands)
      .write.mode("append").parquet(s"${index.path}/sigs")

  /** Compact a signature index after append-heavy runs — the
    * maintenance twin of Ivf.compactIndex. Every [[appendSignatures]]
    * round (one per micro-batch under [[streamingIngest]]) leaves a new
    * file under `sigs/`, and a replayed batch re-appends EXACT duplicate
    * rows (same doc_id ⇒ same signature under the index's own
    * parameters); probe cost is files-opened + rows-scanned, so both
    * accumulate. Compaction drops duplicate doc_ids and rewrites the
    * accumulated per-batch files into `numFiles` parquet files. The
    * rewrite lands in a fresh `sigs_new` directory and is swapped in by
    * rename, so a crash mid-compact leaves the live index intact (at
    * worst a stale `sigs_old`/`sigs_new` to sweep). `dedupAgainst` over
    * a compacted index flags identically (specced). */
  def compact(spark: SparkSession, path: String, numFiles: Int = 32): Unit = {
    val idx = openSignatures(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/sigs")
    val fresh = new org.apache.hadoop.fs.Path(s"$path/sigs_new")
    val old = new org.apache.hadoop.fs.Path(s"$path/sigs_old")
    // sweep leftovers of an earlier crashed compact BEFORE writing, so
    // the renames below cannot silently no-op against a stale target
    if (fs.exists(old)) fs.delete(old, true)
    idx.sigs.dropDuplicates("doc_id")
      .repartition(numFiles)
      .write.mode("overwrite").parquet(s"$path/sigs_new")
    // every rename result is CHECKED: Hadoop's rename reports failure by
    // returning false (dst exists, src missing), not by throwing — an
    // unchecked swap can corrupt the live index while looking successful
    if (!fs.rename(live, old))
      throw new java.io.IOException(
        s"compact: failed to archive $live to $old — live index untouched")
    if (!fs.rename(fresh, live)) {
      // restore the live index before failing: the archive rename
      // succeeded, so rolling back cannot hit an existing target
      fs.rename(old, live)
      throw new java.io.IOException(
        s"compact: failed to swap $fresh into place — live index restored")
    }
    fs.delete(old, true)
  }

  /** Flag each new document against the stored corpus: one corpus-scan
    * bucket join (batch side broadcast), first-agree band dedup, minhash
    * agreement estimate ≥ `threshold` decides.
    *
    * Returns one row per `newDocs` id:
    * (doc_id, is_duplicate, dup_of, match_est) where `dup_of` is the
    * SMALLEST matching corpus id (the canonical-keeper convention of
    * Dedup.exact) and `match_est` the largest agreement estimate over all
    * matched corpus docs; both null when no match. Ids present in both
    * the index and `newDocs` match themselves (est 1.0) — dedupAgainst is
    * for ids the corpus has not seen. */
  def dedupAgainst(index: SigIndex, newDocs: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    val bands = index.bands
    val batch = signed(newDocs, index.k, bands).localCheckpoint(true)
    val batchB = batch.select(col("doc_id").as("q_id"), col("sig").as("q_sig"),
      col("bkts").as("q_bkts"), posexplode(col("bkts")).as(Seq("band", "bucket")))
    val corpusB = index.sigs.select(col("doc_id").as("c_id"), col("sig"),
      col("bkts"), posexplode(col("bkts")).as(Seq("band", "bucket")))
    // first agreeing band: the joined band always agrees; keep the row
    // only if no LOWER band agrees — flat element_at arithmetic in
    // whole-stage codegen over the two carried bucket arrays
    val agreeBits = (0 until bands).map { b =>
      when(element_at(col("bkts"), b + 1) === element_at(col("q_bkts"), b + 1),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val earlierMask = expr("shiftleft(CAST(1 AS BIGINT), band)") - lit(1L)
    val matches = corpusB.join(broadcast(batchB), Seq("band", "bucket"))
      .filter(agreeBits.bitwiseAND(earlierMask) === 0L)
      .withColumn("est",
        org.apache.spark.sql.graft.ColumnBridge
          .matchCount(col("sig"), col("q_sig")).cast("double") / lit(index.k))
      .filter(col("est") >= threshold)
      .groupBy(col("q_id").as("doc_id"))
      .agg(min(col("c_id")).as("dup_of"), max(col("est")).as("match_est"))
    // matches is at most batch-sized (one row per flagged new doc) — the
    // same side already broadcast into the bucket join — so the flag join
    // broadcasts too instead of shuffling newDocs
    newDocs.select(col("doc_id")).join(broadcast(matches), Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_duplicate"),
        col("dup_of"), col("match_est"))
  }

  /** The streaming ingest loop: each micro-batch of documents is probed
    * against the signature index, its flags appended to `outPath`, and
    * the CLEAN documents' signatures appended to the index — so every
    * micro-batch dedups against the corpus PLUS all earlier batches. This
    * is the `foreachBatch` idiom production ingest runs: micro-batches
    * execute sequentially, so the read-probe-append cycle needs no
    * locking, and the checkpoint makes the loop restartable (a replayed
    * batch re-flags identically; its re-appended signatures are exact
    * duplicates that only cost index space until the next rebuild).
    *
    * Intra-batch duplicates are not flagged (dedupAgainst semantics);
    * shrink the trigger or run MinHashLsh.exactPairs inside the batch if
    * that matters.
    *
    * `prepare` runs on each micro-batch BEFORE dedup — the hook where the
    * curation gate plugs in (`TextAnalysis.curate`-style filters, PII
    * redaction, normalization): documents it drops are neither flagged,
    * written, nor signed, so the standard curate→dedup→append ingest
    * pipeline is this one call. Must be a per-row transform preserving
    * doc_id/text (stage fusion keeps the batch single-pass). */
  def streamingIngest(docsStream: DataFrame, indexPath: String,
      outPath: String, checkpoint: String, threshold: Double = 0.9,
      prepare: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        val spark = batch.sparkSession
        val idx = openSignatures(spark, indexPath)
        val prepared = prepare(batch.toDF())
        // materialized: the flags are written AND drive the append filter
        val flagged = dedupAgainst(idx, prepared, threshold).localCheckpoint(true)
        flagged.write.mode("append").parquet(outPath)
        appendSignatures(idx, prepared.join(
          flagged.filter(!col("is_duplicate")).select("doc_id"), "doc_id"))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
