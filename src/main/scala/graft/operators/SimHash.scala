package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection (SURVEY.md §2 dd_simhash): every token's
  * 64-bit xxhash votes ±1 per bit position; the sign pattern is the doc's
  * 64-bit fingerprint, and near-dups are pairs within a small Hamming
  * distance.
  *
  * The fingerprint is computed per-row with array expressions (one scan,
  * no shuffle). Pairing blocks on the first 16 bits — Hamming-close docs
  * almost always share the prefix block; at 100 TB the standard
  * multi-rotation trick (block on several bit-rotations) drops the miss
  * rate geometrically while keeping the join bucket-local.
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

  /** Near-dup pairs: same 16-bit prefix block, Hamming distance ≤ maxDist
    * over the full 64 bits (64 − native match count). */
  def nearDupPairs(documents: DataFrame, maxDist: Int = 6): DataFrame = {
    val fps = fingerprints(documents)
    val a = fps.as("a")
    val b = fps.as("b")
    a.join(b,
        col("a.prefix16") === col("b.prefix16")
          && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        (lit(64) - org.apache.spark.sql.graft.ColumnBridge
          .matchCount(col("a.bits"), col("b.bits"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
      .orderBy("doc_a", "doc_b")
  }
}
