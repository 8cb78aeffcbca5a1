package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-gate for cross-run exact dedup — the cheap first tier
  * in front of the signature-index probe (reference analog: the
  * pipeline's repeated clean-and-append runs, src/pipeline_batch.py:36
  * `load_raw_data` + append, which re-scan history to drop re-ingested
  * rows; re-expressed as a constant-size sketch instead of a re-scan).
  *
  * A training-data ingest loop sees mostly-new documents every batch.
  * Probing the persisted signature index (IncrementalDedup) costs a
  * bucket-pruned join per batch; this gate removes the definitely-new
  * bulk first with ZERO joins: a Bloom filter over the historical
  * corpus's normalized fingerprints is built once (one aggregate —
  * partial sketches merge map-side, the driver holds one ~MB bitset),
  * broadcast as a literal into the batch scan, and each batch row costs
  * one xxhash64 + O(k) bit probes inside whole-stage codegen.
  *
  * Guarantees (the Bloom contract):
  *   - NO false negatives: a doc whose fingerprint was added is always
  *     flagged `possibly_seen` — the gate never drops a true duplicate.
  *   - False positives at rate ~`fpp` route extra NEW docs into the
  *     expensive tier, which then identifies them as new — correctness
  *     is unaffected, only the second tier's input grows by ~fpp.
  * So `gate` partitions a batch into a definitely-new stream (skips the
  * index probe entirely) and a possibly-seen stream (goes to the exact
  * probe, e.g. IncrementalDedup.dedupAgainst or an anti-join on
  * norm_hash).
  *
  * Scale: the sketch is size-bounded by `numBits` (default sized for
  * `expectedItems` at `fpp`), independent of corpus row count; the build
  * is one pass with map-side partial merge; the probe is per-row
  * codegen with no shuffle and no join. At 100 TB the corpus pass is the
  * scan you already pay for stats, and the batch side never touches the
  * corpus at all. Spark's own runtime-filter machinery (the
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions,
  * which OSS Spark does not expose as SQL functions) provides the
  * codegen'd kernels — no UDFs.
  */
object BloomDedup {

  /** The sorted-distinct-token normalization [[Dedup.exact]] keys on. */
  private def normCol(text: Column): Column =
    concat_ws(" ", array_sort(array_distinct(split(text, " "))))

  /** The normalized exact-dup fingerprint as a hashable long — xxhash64
    * of the same sorted-distinct-token normalization [[Dedup.exact]]
    * keys on (docs equal under `norm_hash` collide here too, by
    * construction). 64-bit: fine for the Bloom GATE (false positives
    * are the gate's contract), but not for an exactness decision —
    * [[newAgainst]]'s second tier keys on [[normKeyCol]] instead. */
  def fingerprintCol(text: Column): Column =
    xxhash64(normCol(text))

  /** The 128-bit exact-tier key: md5 of the normalization, IDENTICAL to
    * [[Dedup.exact]]'s `norm_hash`, so the two-tier result agrees with
    * the batch operator's duplicate decision bit-for-bit. (A 64-bit key
    * here would silently drop a genuinely-new doc on a cross-doc hash
    * collision — expected-by-birthday at multi-billion-doc scale.) */
  def normKeyCol(text: Column): Column =
    md5(normCol(text).cast("binary"))

  /** Optimal Bloom bit count for `n` items at false-positive rate `p`:
    * n·ln(1/p)/ln²2, the textbook sizing. */
  def optimalNumBits(n: Long, p: Double): Long = {
    require(n > 0, s"expectedItems must be positive (got $n)")
    require(p > 0.0 && p < 1.0, s"fpp must be in (0,1) (got $p)")
    math.ceil(n * math.log(1.0 / p) / (math.log(2.0) * math.log(2.0))).toLong
  }

  /** Build the corpus sketch: ONE aggregate over `documents.text`
    * fingerprints → the serialized Bloom filter (driver-side bytes,
    * ~1.2 MB per 1M docs at 1% fpp). `expectedItems` defaults to a
    * metadata-cheap `count()` of the corpus. */
  def buildFilter(documents: DataFrame, expectedItems: Long = 0L,
      fpp: Double = 0.01): Array[Byte] = {
    val n = if (expectedItems > 0) expectedItems else documents.count()
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(fingerprintCol(col("text"))),
        Literal(math.max(n, 1L)),
        Literal(optimalNumBits(math.max(n, 1L), fpp)))
        .toAggregateExpression())
    val bytes = documents.agg(agg.as("bf")).head.getAs[Array[Byte]]("bf")
    require(bytes != null && bytes.nonEmpty, "empty corpus — no filter built")
    bytes
  }

  /** Per-row membership probe against a built sketch — a codegen'd
    * literal-bitset test, usable in any filter/projection. */
  def mightContain(filter: Array[Byte], text: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnBridge.expression(fingerprintCol(text))))

  /** Tag a batch: `possibly_seen` = the doc's fingerprint may be in the
    * history (exact tier must decide); false = DEFINITELY new (skip the
    * probe). No shuffle, no join — one codegen pass over the batch. */
  def gate(batch: DataFrame, filter: Array[Byte]): DataFrame =
    batch.withColumn("possibly_seen", mightContain(filter, col("text")))

  /** Two-tier exact dedup of `batch` against `corpus`: Bloom gate first,
    * then ONE anti-join on the 128-bit [[normKeyCol]] for only the
    * possibly-seen slice. Returns the batch rows that are genuinely new
    * (docs whose normalization never appeared in the corpus). The join's
    * left side is the ~(dups + fpp·batch) possibly-seen slice, not the
    * batch; the corpus side prunes to key equality. The exact tier uses
    * the md5 key (Dedup.exact's `norm_hash`), NOT the gate's 64-bit
    * fingerprint — a 64-bit anti-join would drop a genuinely-new doc on
    * a cross-doc collision, which becomes expected at billions of docs. */
  def newAgainst(batch: DataFrame, corpus: DataFrame,
      filter: Array[Byte]): DataFrame = {
    val gated = gate(batch, filter)
    val seen = gated.filter(col("possibly_seen"))
      .withColumn("fp", normKeyCol(col("text")))
    val corpusFp = corpus.select(normKeyCol(col("text")).as("fp")).distinct()
    val confirmedNew = seen.join(corpusFp, Seq("fp"), "left_anti").drop("fp")
    gated.filter(!col("possibly_seen")).unionByName(confirmedNew)
      .drop("possibly_seen")
  }
}
