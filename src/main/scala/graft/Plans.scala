package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for the headline plans into PLANS.md —
  * the audit artifact behind PlanQualitySpec's assertions. Regenerate with
  * `sbt 'runMain graft.Plans'`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    val picks = Seq(
      "q_pricing_summary" -> ("wide fact-scan aggregate: shipdate filter and " +
        "column pruning pushed into the parquet scan, partial (map-side) " +
        "aggregation before the single shuffle"),
      "q_top_nations" -> ("multi-join report: both dims broadcast (no " +
        "shuffle), fact co-shuffled once on the join key, top-N as " +
        "TakeOrderedAndProject"),
      "ts_rolling" -> ("per-key rolling features: one hash exchange on " +
        "user_id serves both window frames"),
      "ad_zscore" -> ("stats side broadcast back onto the stream — " +
        "per-key statistics never shuffle the fact"),
      "dd_minhash_lsh" -> ("native minhash_signature + " +
        "long_array_match_count kernels inside whole-stage codegen; " +
        "banded join carries narrow keys + the per-doc bucket array, and " +
        "pairs dedup via the first-agree filter — no distinct over the " +
        "candidate stream (no HashAggregate in the pairing plan)"),
      "sim_topk" -> ("brute-force cosine: native float_dot in codegen, " +
        "global top-k as per-partition TakeOrdered merge"),
      "dd_embedding" -> ("embedding near-dup scale path: native " +
        "embedding_lsh_buckets kernel, bucket self-join on (t,bucket) ints " +
        "only, per-pair verify through the fused quantized_cosine14 kernel " +
        "(one primitive int loop + one division; per-vector sqrt-norms " +
        "hoisted above the pair join)"),
      "dd_cluster" -> ("exact cluster sweep: one shared tokenization pass " +
        "(norm-hash rep collapse + signatures + hashed-token verify all " +
        "read it), banded-LSH candidates with first-agree dedup, verify " +
        "on sorted 64-bit token-hash arrays, components via driver " +
        "union-find under the edge bound (distributed pointer-jumped " +
        "rounds above it) — equi-joins throughout, no cartesian/" +
        "nested-loop anywhere"),
      "dd_simhash" -> ("packed-long fingerprints: chunk-combination keys " +
        "by shift/mask, bit_count(xor) Hamming verify, first-agree dedup " +
        "via an agree-bit lookup table — all inside whole-stage codegen, " +
        "no distinct over the candidate stream"),
      "sim_ivf" -> ("pruned probe of the PERSISTED cell-partitioned index: " +
        "the nprobe cell list lands in the scan's PartitionFilters (only " +
        "those directories are read), exact cosine re-rank on the pruned " +
        "rows — a lookup costs nprobe directories, not a corpus scan. " +
        "Dumped at sf0.1, where the row-budget default resolves to " +
        "nprobe=13 of 45 cells, so the INSET below is a STRICT subset " +
        "(at sf0.01's 500-row corpus the budget legitimately covers all " +
        "23 cells — a full probe of a tiny index is the correct dial, " +
        "but it demonstrates nothing about pruning)"),
      "dd_incremental" -> ("incremental ingest dedup: the batch side " +
        "(signatures + exploded band buckets) is broadcast; the stored " +
        "corpus signatures stream through ONE scan with no shuffle; " +
        "first-agree band filter inside the broadcast join, estimate " +
        "decides, batch-sized roll-up broadcast back onto the batch"),
      "dd_contamination" -> ("decontamination scan: the benchmark " +
        "collapses to one sorted gram-array row that rides a broadcast " +
        "nested-loop join; every corpus row scores itself per-row via " +
        "array_intersect — the corpus is read once and never shuffles " +
        "(no hashpartitioning exchange on doc_id anywhere)"),
      "tx_lm_score" -> ("corpus-LM fluency (r15 Zipf-proof form): the " +
        "token_term_counts kernel collapses within-doc repetition in the " +
        "row, the bigram model is a partial-agg groupBy (a Zipf-hot gram " +
        "ships one partial row per map task, never its occurrences) and " +
        "joins back as a BroadcastHashJoin under the heap budget — no " +
        "count-over-gram Window anywhere, so no unsplittable hot-key " +
        "task at any corpus size"),
      "tx_pii" -> ("PII scan: four regexp counts + ordered " +
        "regexp_replace redaction digest, all per-row inside one " +
        "whole-stage-codegen project over the scan — no exchange except " +
        "the presentation sort"),
      "ds_sample" -> ("deterministic stratified sampling: the Lehmer-key " +
        "predicate is pure per-row arithmetic evaluated at the scan — " +
        "no join, no aggregation, no shuffle; membership is a filter, " +
        "so at 100 TB the sample costs one pass and nothing more"),
      "ds_shuffle" -> ("deterministic global shuffle into training " +
        "shards: a 2-column pruned scan, the Lehmer permutation key as " +
        "per-row arithmetic, and ONE exchange — the partition-by-shard " +
        "the shard write needs anyway — with only an in-partition sort; " +
        "no global ordering bottleneck"),
      "ds_mix" -> ("target-proportion mixture: per-source counts as a " +
        "column-pruned map-side agg, the one-row T* and per-source " +
        "rates broadcast back (BroadcastHashJoin), membership decided " +
        "by scan-side arithmetic — the corpus itself never shuffles"),
      "ds_epochs" -> ("epoch/repetition planning: the tiny per-source " +
        "plan (full epochs + partial-epoch rate) broadcasts back and " +
        "epoch rows are a scan-side Generate explode — row " +
        "multiplication without any corpus exchange"),
      "ds_assemble" -> ("the composed assembly capstone: curation + " +
        "mixture membership fused into the scan-side row pipeline, the " +
        "tiny mix/epoch plans broadcast back, epoch instances a " +
        "scan-side Generate explode, and ONE hashpartitioning(shard) " +
        "exchange serving BOTH windows (shuffle pos + pack prefix-sum) " +
        "— the same exchange the shard write needs; token counts ride a " +
        "narrow (doc_id, n_tokens) join, never the text"),
      "tx_curate" -> ("the composed curation gate: quality + repetition + " +
        "PII stacked as per-row column stages — Catalyst fuses all three " +
        "into ONE whole-stage-codegen project over a single scan, so the " +
        "full gate costs one corpus read, not one sweep per signal; the " +
        "presentation range sort sits BELOW the projection (r12), so its " +
        "bound-sampling pass reads the scan, never the gate expressions"),
      "tx_boilerplate" -> ("corpus template mining: distinct-per-doc gram " +
        "votes explode into a count roll-up with map-side partials; the " +
        "bounded final ordering (topK through limit, r6) plans as " +
        "TakeOrderedAndProject — per-partition top-k heaps + one k-row " +
        "merge, never a full sort of every surviving gram"))

    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of the headline queries\n\n")
    sb.append("Generated by `sbt 'runMain graft.Plans'` at sf0.01; the\n")
    sb.append("properties called out here are pinned by PlanQualitySpec.\n")
    // sim_ivf dumps at sf0.1: nprobe < cells there, so the pinned
    // PartitionFilters evidence shows a strict-subset INSET
    val dirOverrides = Map("sim_ivf" -> "/root/testdata/sf0.1")
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, dirOverrides.getOrElse(name, dir))
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
