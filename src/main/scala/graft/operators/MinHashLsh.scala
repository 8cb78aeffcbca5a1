package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH banding — the scale path for near-dup detection
  * (SURVEY.md §2 dd_minhash_lsh). Estimates the same token-set Jaccard as
  * Dedup.ngramJaccard but never enumerates non-candidate pairs:
  *
  *   1. k seeded murmur3 min-hashes per doc → signature (one narrow map).
  *   2. signatures cut into b bands of r rows; each band hashed to a
  *      bucket key → docs exploded to b rows.
  *   3. docs sharing any (band, bucket) become candidate pairs — the only
  *      shuffle keys are the band buckets, so work tracks collision
  *      density, not corpus². With b=8, r=8, pairs at Jaccard j collide
  *      with prob 1-(1-j^8)^8 (≈0.96 at j=0.9, ≈0.04 at j=0.5).
  *   4. candidates verified with the exact signature-agreement estimate
  *      and thresholded.
  *
  * At 100 TB this is the dedup entry point: stages 1-2 are scan-speed,
  * stage 3's self-join is bucket-local, and the verified pairs feed a
  * connected-components pass if full clustering is needed.
  */
object MinHashLsh {

  /** Signature: for each of k seeds, min over tokens of hash(token, seed). */
  def signatures(documents: DataFrame, k: Int = 64): DataFrame =
    documents.select(
      col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks"))
      .withColumn("sig",
        transform(sequence(lit(0), lit(k - 1)),
          i => array_min(transform(col("toks"), t => hash(t, i)))))

  /** Candidate pairs via banding + signature-agreement estimate. */
  def candidatePairs(documents: DataFrame, k: Int = 64, bands: Int = 8,
      threshold: Double = 0.9): DataFrame = {
    val rows = k / bands
    val sigs = signatures(documents, k)
    // the banded join and its distinct carry only (band, bucket, id) ints —
    // signatures are re-attached to the deduped pair ids afterwards, so the
    // shuffle payload stays narrow no matter how hot the buckets are
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rows + lit(1), lit(rows)), b).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sa = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    pairs
      .join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard_est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          idx => idx)).cast("double") / lit(k))
      .filter(col("jaccard_est") >= threshold)
      .select("doc_a", "doc_b", "jaccard_est")
      .orderBy("doc_a", "doc_b")
  }
}
