package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-dup detection (SURVEY.md §2 dd_simhash): every token's
  * 64-bit hash (engine-neutral poly+splitmix64 — see TokenHashes, which
  * is what lets the DuckDB oracle reproduce the fingerprints bit-exactly)
  * votes ±1 per bit position; the sign pattern is the doc's 64-bit
  * fingerprint, and near-dups are pairs within a small Hamming distance.
  *
  * The fingerprint lives as ONE packed long: the sign bits from the
  * native SimHashBits kernel are folded MSB-first with shift/or (bitwise
  * ops, so no ANSI overflow semantics apply). Everything downstream —
  * blocking keys, the candidate join, the Hamming verify — operates on
  * that single long, so the pairing stages shuffle 8-byte keys instead
  * of 64-element arrays and the verify is one `bit_count(xor)` per
  * candidate instead of an element-wise array comparison.
  *
  * Pairing blocks on CHUNK COMBINATIONS (the table construction from
  * Manku/Jain/Sarma's WWW'07 scheme): the fingerprint is split into
  * t = maxDist+2 disjoint chunks, and a pair within Hamming distance d
  * touches at most d of them, so by pigeonhole it agrees EXACTLY on at
  * least TWO chunks — i.e. on at least one of the C(t,2) two-chunk
  * combination keys. Coverage is complete, not probabilistic, while the
  * combined keys carry ~2·64/t bits each, which keeps buckets fine even
  * on a heavily biased corpus (single ~64/t-bit chunks collide so often
  * on self-similar text that candidate volume runs an order of magnitude
  * past the verified output; measured 7.7M candidates for 0.6M verified
  * pairs at sf0.1 before this refinement, ~0.7M after). Degenerate
  * buckets are still bounded by the shared hot-bucket guard
  * (MinHashLsh.guardedBucketPairs).
  */
object SimHash {

  /** Per-doc packed 64-bit simhash fingerprint (MSB = bit 0 of the
    * kernel's sign array). Computed per-row in one scan — no shuffle at
    * any corpus size; the 64-step packing fold is O(64) per document,
    * once, never per candidate pair. */
  def fingerprints(documents: DataFrame): DataFrame = {
    val toks = array_distinct(split(col("text"), " "))
    // votes[j] = Σ_tokens (bit j of xxhash64(token) ? +1 : -1), computed by
    // the native codegen kernel (org.apache.spark.sql.graft.SimHashBits)
    documents
      .withColumn("bits",
        org.apache.spark.sql.graft.ColumnBridge.simhashBits(
          org.apache.spark.sql.graft.ColumnBridge.tokenHashes64(toks)))
      .withColumn("fp",
        aggregate(col("bits"), lit(0L),
          (acc, x) => shiftleft(acc, 1).bitwiseOR(x)))
      .select("doc_id", "source", "fp")
  }

  /** (bit offset from MSB, length) of each of the `nChunks` contiguous
    * fingerprint chunks. */
  private def chunkRanges(nChunks: Int): Seq[(Int, Int)] = {
    val base = 64 / nChunks
    val rem = 64 % nChunks
    (0 until nChunks).map { p =>
      (p * base + math.min(p, rem), base + (if (p < rem) 1 else 0))
    }
  }

  /** Mask covering chunk bits [start, start+len) counted from the MSB. */
  private def chunkMask(start: Int, len: Int): Long = {
    val m = if (len >= 64) -1L else (1L << len) - 1L
    m << (64 - start - len)
  }

  /** Bits [start, start+len) of the packed fingerprint, counted from the
    * MSB — pure bitwise extraction, no explode of the fingerprint. */
  private def chunkKey(fp: Column, start: Int, len: Int): Column = {
    val mask = if (len >= 64) -1L else (1L << len) - 1L
    shiftrightunsigned(fp, 64 - start - len).bitwiseAND(lit(mask))
  }

  /** The (i, j) chunk index pairs, in block-index order — the shared
    * enumeration [[blockKeys]] and the first-agree filter both follow. */
  private def combos(nChunks: Int): Seq[(Int, Int)] =
    for { i <- 0 until nChunks; j <- (i + 1) until nChunks } yield (i, j)

  /** Per-doc (block, key, fp) rows: the fingerprint split into `nChunks`
    * contiguous chunks, then one row per two-chunk combination (i<j),
    * keyed on both chunk values packed into one long. One explode per
    * doc — the blocking join only ever carries these narrow rows,
    * C(nChunks,2) of them per doc, with the 8-byte fingerprint riding
    * along so verification needs no join back to the corpus. */
  private[graft] def blockKeys(fps: DataFrame, nChunks: Int): DataFrame = {
    val ranges = chunkRanges(nChunks)
    val chunks = ranges.map { case (start, len) => chunkKey(col("fp"), start, len) }
    // chunk length ≤ 64/3 ≈ 21 bits < 32, so (c_i << 32) | c_j is collision-free
    val keys = combos(nChunks).map { case (i, j) =>
      shiftleft(chunks(i), 32).bitwiseOR(chunks(j))
    }
    fps.select(col("doc_id"), col("fp"),
        posexplode(array(keys: _*)).as(Seq("blk", "key")))
  }

  /** Near-dup pairs at Hamming distance ≤ maxDist over the full 64 bits.
    * Candidates come from the maxDist+2-chunk combination blocking, whose
    * coverage is exact by pigeonhole (see object doc): a near-dup pair
    * differing anywhere agrees on some two-chunk key. Precision is exact
    * too — every candidate is Hamming-verified with one `bit_count(xor)`
    * on the packed fingerprints.
    *
    * Duplicate suppression is SHUFFLE-FREE on the main path: instead of
    * a distinct over the (quadratic-ish) candidate stream, each pair is
    * kept only at its FIRST agreeing chunk combination — a pure function
    * of fp_a XOR fp_b, evaluable inline because the fingerprints ride
    * through the bucket join. Only the hub-star rows from oversized
    * buckets (normally none) can still duplicate a surviving pair, so
    * the final distinct runs over verified near-dups, not candidates. */
  def nearDupPairs(documents: DataFrame, maxDist: Int = 6,
      maxBucket: Int = 4096): DataFrame = {
    // 64-bit simhash stops being a near-dup signal well before Hamming 9
    // (random fingerprints center on 32); the cap also keeps the combo
    // count within one bitmask long (C(11,2)=55) and the first-agree
    // lookup table (2^nChunks entries) trivially small
    require(maxDist >= 1 && maxDist <= 9,
      s"maxDist must be in [1, 9] (got $maxDist)")
    val nChunks = maxDist + 2
    val fps = fingerprints(documents)
    val (raw, nOver, bucketRows) = MinHashLsh.guardedBucketPairsRaw(
      blockKeys(fps, nChunks), Seq("blk", "key"), "doc_id", maxBucket,
      carry = Seq("fp"))
    val xor = col("fp_a").bitwiseXOR(col("fp_b"))
    // agreeBits: bit c set iff the pair agrees on chunk c — flat integer
    // arithmetic, no branching, stays inside whole-stage codegen (a
    // nested CASE WHEN over the C(nChunks,2) combos measured ~10× slower
    // here: the tree blows past the codegen method limit and evaluates
    // interpreted per candidate row)
    val masks = chunkRanges(nChunks).map { case (s, l) => chunkMask(s, l) }
    val agreeBits = masks.zipWithIndex.map { case (m, c) =>
      when(xor.bitwiseAND(lit(m)) === 0, lit(1 << c)).otherwise(lit(0))
    }.reduce(_ + _)
    // comboAgree[s] = bitmask over combo indices whose two chunks both
    // agree under chunk-agree-mask s (maxDist ≤ 9 keeps C(nChunks,2) ≤ 55
    // inside one long)
    val comboList = combos(nChunks)
    val comboAgree = (0 until (1 << nChunks)).map { s =>
      comboList.zipWithIndex.foldLeft(0L) { case (m, ((i, j), k)) =>
        if (((s >> i) & 1) == 1 && ((s >> j) & 1) == 1) m | (1L << k) else m
      }
    }.toArray
    val comboMask = element_at(typedlit(comboAgree), agreeBits + 1)
    val earlierMask =
      expr("shiftleft(CAST(1 AS BIGINT), blk)") - lit(1L)
    val verify = col("hamming") <= maxDist
    val verified =
      if (nOver == 0) {
        // keep each pair only at its first agreeing combo — exactly once
        raw.withColumn("hamming", bit_count(xor).cast("long"))
          .filter(verify && (col("is_hub") ||
            comboMask.bitwiseAND(earlierMask) === 0L))
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
      } else {
        // hub mode: an agreement at an OVERSIZED combo bucket produced no
        // small-bucket row, so it must not suppress the pair's first
        // small-bucket occurrence — mask those combos out via a per-doc
        // oversize bitmask (shared bucket ⇒ shared status), then dedup
        // the hub duplicates over verified pairs only. Both scans read
        // the guard's CHECKPOINTED bucket rows, not the fingerprint
        // lineage.
        val overKeys = bucketRows.groupBy(col("blk"), col("key"))
          .agg(count(lit(1)).as("__m"))
          .filter(col("__m") > maxBucket)
          .drop("__m")
        val overMask = bucketRows.join(overKeys, Seq("blk", "key"))
          .groupBy(col("doc_id"))
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), blk)")).as("__over"))
        raw
          .join(overMask.select(col("doc_id").as("id_a"), col("__over")),
            Seq("id_a"), "left")
          .withColumn("__over", coalesce(col("__over"), lit(0L)))
          .withColumn("hamming", bit_count(xor).cast("long"))
          .filter(verify && (col("is_hub") || comboMask
            .bitwiseAND(bitwise_not(col("__over")))
            .bitwiseAND(earlierMask) === 0L))
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
          .distinct()
      }
    verified.orderBy("doc_a", "doc_b")
  }
}
