package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly — the concat-and-chunk
  * pass every LLM pre-training pipeline runs between curation and
  * tokenizer sharding: documents are concatenated in a deterministic
  * order and cut into fixed token-budget training sequences, and each
  * document needs to know WHICH sequence(s) it landed in (for
  * provenance, loss masking across boundaries, and shard manifests).
  * (The reference has no analog — this extends its ETL surface the way
  * a training-data pipeline would, like ds_sample/ds_split.)
  *
  * Packing is assignment arithmetic over a running token prefix-sum, so
  * it is expressible as ONE window aggregation — no shuffle beyond the
  * window's, no RNG, no driver loop:
  *
  *   start_tok = sum(n_tokens) over (shard, doc order) − n_tokens
  *   seq_id    = start_tok div budget
  *   n_seqs    = (start_tok + n_tokens − 1) div budget − seq_id + 1
  *
  * Scale shape: a GLOBAL prefix-sum would serialize the corpus through
  * one window partition, so packing runs per SHARD (`pmod(doc_id,
  * shards)`) — each shard's stream is packed independently and in
  * parallel, which is exactly how training shards are consumed; the
  * shard count is the parallelism dial (set it ≈ the cluster's target
  * output-file count at 100 TB). Within a shard the order is doc_id —
  * total, so the assignment is bit-reproducible across runs, engines
  * and partition layouts (same determinism contract as ds_split).
  *
  * Token counts route through [[TextAnalysis.tokenCount]] — the one
  * engine token counter (tx_tokens' whitespace convention) — so the
  * same oracle pairing holds bit-exactly and a budget calibrated
  * against tx_tokens output means the same thing here.
  */
object Packing {

  /** Per-document sequence assignment: (doc_id, shard, n_tokens,
    * start_tok, seq_id, seq_offset, n_seqs) where `seq_id` is the
    * first budget-sized sequence this doc occupies within its shard,
    * `seq_offset` the doc's start position inside it, and `n_seqs` how
    * many consecutive sequences the doc spans (>1 = straddles
    * boundaries; a loss-masking consumer treats those rows specially). */
  def packSequences(documents: DataFrame, budget: Long = 2048,
      shards: Int = 32): DataFrame = {
    require(shards > 0, s"shards must be positive (got $shards)")
    assignSequences(
      documents
        .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)).cast("int"))
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text"))),
      budget, orderCol = "doc_id")
      .select("doc_id", "shard", "n_tokens", "start_tok", "seq_id",
        "seq_offset", "n_seqs")
      .orderBy("doc_id")
  }

  /** The packing kernel shared by [[packSequences]] and the composed
    * assembly pipeline: given rows carrying (`shard`, `n_tokens`) and a
    * total per-shard order column `orderCol`, assign each row its
    * running token prefix-sum and budget-chunk sequence ids. One window
    * aggregation per shard — the prefix-sum's partition-by-shard is the
    * only exchange, and when the input already arrives partitioned by
    * shard (the assembly pipeline's shuffle stage) AQE reuses that
    * exchange instead of adding one. */
  def assignSequences(df: DataFrame, budget: Long, orderCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive (got $budget)")
    val w = Window.partitionBy(col("shard")).orderBy(col(orderCol))
    df.withColumn("start_tok",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      // integer `div`, not `/`: prefix sums at corpus scale exceed
      // double's 2^53 exact range long before 100 TB does
      .withColumn("seq_id", call_function("div", col("start_tok"), lit(budget)))
      .withColumn("seq_offset", pmod(col("start_tok"), lit(budget)))
      .withColumn("n_seqs",
        call_function("div",
          col("start_tok") + col("n_tokens") - lit(1L), lit(budget))
          - col("seq_id") + lit(1L))
  }

  /** Per-document chunking — the OTHER long-document pass every training
    * and embedding pipeline runs: split each document into overlapping
    * fixed-token-budget windows (context-window fitting, long-doc
    * embedding, retrieval indexing), one output row per chunk. Where
    * [[packSequences]] concatenates documents ACROSS rows into
    * sequences, chunking cuts WITHIN a row — the two compose (chunk
    * long docs first, pack the chunks).
    *
    * Chunk k of a document covers tokens [k·(budget−overlap),
    * k·(budget−overlap)+budget); the last chunk may be shorter, and the
    * chunk count is ⌈max(n−overlap, 1) / (budget−overlap)⌉ in INTEGER
    * arithmetic, so every token is covered, consecutive chunks share
    * exactly `overlap` tokens (except a shorter tail), and a document
    * shorter than the budget is exactly one chunk — itself.
    *
    * Entirely per-row (explode over a sequence of chunk indices + array
    * slices of the one token split): no shuffle at any corpus size
    * except the presentation sort; 100 TB cost is one scan with ~
    * (1 + overlap/budget)× output amplification. Tokens are the engine
    * convention ([[TextAnalysis.tokenCount]]'s whitespace split), and
    * chunk_text re-joins with single spaces — over the split-on-every-
    * single-space token contract that reproduces the exact source
    * substring, so the DuckDB twin (string_split / list slice /
    * array_to_string, same integer chunk-count form) is bit-exact. */
  def chunkDocuments(documents: DataFrame, budget: Int = 512,
      overlap: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive (got $budget)")
    require(overlap >= 0 && overlap < budget,
      s"overlap must be in [0, budget) (got $overlap for budget $budget)")
    val step = budget - overlap
    documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_chunks",
        greatest(call_function("div",
          greatest(size(col("toks")).cast("long") - lit(overlap.toLong), lit(1L))
            + lit(step.toLong - 1L), lit(step.toLong)), lit(1L)))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_no"),
        col("toks"))
      .withColumn("chunk_toks",
        slice(col("toks"), (col("chunk_no") * step + 1).cast("int"), lit(budget)))
      .select(
        col("doc_id"), col("chunk_no"),
        array_join(col("chunk_toks"), " ").as("chunk_text"),
        size(col("chunk_toks")).cast("long").as("n_tokens"))
      .orderBy("doc_id", "chunk_no")
  }
}
