package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomDedup, Dedup}
import graft.sources.Tables

/** The Bloom pre-gate's contract: no false negatives ever (a true
  * duplicate is always routed to the exact tier), false positives
  * bounded near the configured rate, the two-tier `newAgainst` exactly
  * equal to the plain anti-join (the Bloom tier is an optimization, not
  * an approximation of the RESULT), and the probe plan join-free. */
class BloomDedupSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private lazy val docs = Tables.documents(spark, sf).cache()
  // batch = every 5th doc (the IncrementalDedup convention) — guaranteed
  // overlap through the corpus's exact-duplicate groups
  private lazy val batch = docs.filter(col("doc_id") % 5 === 0)
  private lazy val corpus = docs.filter(col("doc_id") % 5 =!= 0)
  private lazy val filter = BloomDedup.buildFilter(corpus)

  test("no false negatives: every batch doc whose normalization exists in the corpus is possibly_seen") {
    // ground truth via the exact-dedup normalization: norm_hash groups
    // spanning corpus and batch are true cross-set duplicates
    val normOf = Dedup.exact(docs).select(col("doc_id"), col("norm_hash"))
    val corpusNorms = normOf.join(corpus.select("doc_id"), "doc_id")
      .select("norm_hash").distinct()
    val trueDups = normOf.join(batch.select("doc_id"), "doc_id")
      .join(corpusNorms, "norm_hash")
      .select("doc_id")
    assert(trueDups.count() > 0, "test corpus has no cross-set duplicates — not exercising the gate")
    val flagged = BloomDedup.gate(batch, filter)
      .filter(col("possibly_seen")).select("doc_id")
    assert(trueDups.join(flagged, "doc_id").count() === trueDups.count(),
      "a true duplicate escaped the Bloom gate — false negatives break dedup")
  }

  test("false-positive rate stays near the configured fpp") {
    // fresh synthetic docs that are definitely NOT in the corpus
    import spark.implicits._
    val fresh = (0 until 20000)
      .map(i => (1000000L + i, s"unique document number $i payload"))
      .toDF("doc_id", "text")
    val fp = BloomDedup.gate(fresh, filter)
      .filter(col("possibly_seen")).count()
    // configured 1% — allow 5x headroom for sketch-rounding and the
    // small corpus (binomial noise at 20k trials is tiny; the bound
    // catches a broken sizing formula, not statistical jitter)
    assert(fp <= 20000 * 0.05, s"$fp of 20000 fresh docs flagged (>5% vs 1% target)")
  }

  test("two-tier newAgainst equals the plain anti-join result exactly") {
    val got = BloomDedup.newAgainst(batch, corpus, filter)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // oracle on the normalization STRING itself — no hash of any width
    val norm = concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))
    val batchFp = batch.withColumn("fp", norm)
    val corpusFp = corpus.select(norm.as("fp")).distinct()
    val want = batchFp.join(corpusFp, Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want))
  }

  test("the exact tier keys on Dedup.exact's 128-bit norm_hash, not the 64-bit gate fingerprint") {
    // bit-for-bit agreement with the batch operator's duplicate key: the
    // two-tier decision and Dedup.exact collapse exactly the same docs
    val mismatch = Dedup.exact(docs).select("doc_id", "norm_hash")
      .join(docs.select(col("doc_id"),
        BloomDedup.normKeyCol(col("text")).as("bloom_key")), "doc_id")
      .filter(col("bloom_key") =!= col("norm_hash")).count()
    assert(mismatch === 0L,
      "newAgainst's exact-tier key diverged from Dedup.exact's norm_hash")
  }

  test("the gate plan is join-free and shuffle-free") {
    val plan = BloomDedup.gate(batch, filter)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"gate must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"gate must not shuffle:\n$plan")
  }

  test("optimal sizing follows the textbook formula") {
    // 1M items at 1% → ~9.59M bits (~1.2 MB)
    val bits = BloomDedup.optimalNumBits(1000000L, 0.01)
    assert(bits > 9500000L && bits < 9700000L, s"got $bits")
    intercept[IllegalArgumentException] { BloomDedup.optimalNumBits(0, 0.01) }
    intercept[IllegalArgumentException] { BloomDedup.optimalNumBits(10, 1.5) }
  }
}
