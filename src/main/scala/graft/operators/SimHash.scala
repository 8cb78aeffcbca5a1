package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection (SURVEY.md §2 dd_simhash): every token's
  * 64-bit xxhash votes ±1 per bit position; the sign pattern is the doc's
  * 64-bit fingerprint, and near-dups are pairs within a small Hamming
  * distance.
  *
  * The fingerprint is computed per-row with array expressions (one scan,
  * no shuffle). Pairing blocks on maxDist+1 disjoint bit chunks of the
  * fingerprint (the multi-block refinement of Manku/Jain/Sarma's
  * rotation scheme): a pair within Hamming distance d can touch at most
  * d of the d+1 chunks, so by pigeonhole it agrees EXACTLY on at least
  * one chunk — candidate coverage is complete, not probabilistic, while
  * every join stays bucket-local. Degenerate chunk buckets are bounded
  * by the shared hot-bucket guard (MinHashLsh.guardedBucketPairs).
  */
object SimHash {

  /** Per-doc 64-bit simhash as an array of 64 sign bits (0/1). */
  def fingerprints(documents: DataFrame): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    // votes[j] = Σ_tokens (bit j of xxhash64(token) ? +1 : -1), computed by
    // the native codegen kernel (org.apache.spark.sql.graft.SimHashBits)
    documents
      .withColumn("bits",
        org.apache.spark.sql.graft.ColumnBridge.simhashBits(
          transform(toks, t => xxhash64(t))))
      // prefix packed to a scalar so the blocking join keys on a long,
      // not on array equality
      .withColumn("prefix16",
        aggregate(slice(col("bits"), 1, 16), lit(0L), (acc, x) => acc * 2 + x))
      .select("doc_id", "source", "bits", "prefix16")
  }

  /** Per-doc (block, key) rows: the 64 fingerprint bits split into
    * `nBlocks` contiguous chunks, each packed to a long block key. One
    * explode per doc — the blocking join only ever carries these narrow
    * (blk, key, id) rows. */
  private[graft] def blockKeys(fps: DataFrame, nBlocks: Int): DataFrame = {
    val base = 64 / nBlocks
    val rem = 64 % nBlocks
    val chunks = (0 until nBlocks).map { p =>
      val start = p * base + math.min(p, rem)
      val len = base + (if (p < rem) 1 else 0)
      aggregate(slice(col("bits"), start + 1, len), lit(0L),
        (acc, x) => acc * 2 + x)
    }
    fps.select(col("doc_id"),
        posexplode(array(chunks: _*)).as(Seq("blk", "key")))
  }

  /** Near-dup pairs at Hamming distance ≤ maxDist over the full 64 bits
    * (64 − native match count). Candidates come from the maxDist+1-chunk
    * blocking, whose coverage is exact by pigeonhole (see object doc):
    * a near-dup pair differing anywhere — including inside the first 16
    * bits — shares at least one chunk bucket. Precision is exact too
    * (every candidate is Hamming-verified). */
  def nearDupPairs(documents: DataFrame, maxDist: Int = 6,
      maxBucket: Int = 4096): DataFrame = {
    val fps = fingerprints(documents)
    val cand = MinHashLsh.guardedBucketPairs(
        blockKeys(fps, maxDist + 1), Seq("blk", "key"), "doc_id", maxBucket)
      .withColumnRenamed("id_a", "doc_a")
      .withColumnRenamed("id_b", "doc_b")
    val fa = fps.select(col("doc_id").as("doc_a"), col("bits").as("bits_a"))
    val fb = fps.select(col("doc_id").as("doc_b"), col("bits").as("bits_b"))
    cand.join(fa, "doc_a").join(fb, "doc_b")
      .withColumn("hamming",
        (lit(64) - org.apache.spark.sql.graft.ColumnBridge
          .matchCount(col("bits_a"), col("bits_b"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
