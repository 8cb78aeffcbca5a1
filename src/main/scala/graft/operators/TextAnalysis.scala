package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis operators over the document corpus (SURVEY.md §2 tx_*):
  * token statistics, quality scoring, language identification and
  * fingerprinting — the text half of the training-data-pipeline surface.
  *
  * Everything here is per-row expression work (whole-stage codegen, no
  * shuffle); the operators scale linearly with the scan.
  */
object TextAnalysis {
  /** Presentation ordering applied BELOW the per-row projection: sorting
    * the raw documents FIRST and projecting after keeps the output order
    * identical (Project preserves child ordering) while the range
    * exchange's sampling pass reads the cheap scan instead of evaluating
    * the whole per-row expression chain — Spark's range partitioner runs
    * one full child evaluation just to pick bounds, so sort-on-top paid
    * every regex/kernel TWICE (measured: tx_normalize 3.3 s -> 0.45 s at
    * sf1). Used by every pure per-row query view below. */
  private def byDoc(documents: DataFrame): DataFrame =
    documents.orderBy("doc_id")


  private val stopwords = Seq("the", "a", "of", "to", "and", "in")

  /** THE engine token counter — whitespace tokens as a long. Every
    * "token budget" in the library means this one expression: tx_tokens'
    * n_tokens, the quality/curation length term, tx_pack's sequence
    * budget, corpus totals, and the assembly capstone's pack stage all
    * route through it, so a budget set against tx_tokens output packs
    * the same number of sequences in ds_assemble. (The DuckDB twin is
    * `len(string_split(text, ' '))` — shared by every oracle.) */
  def tokenCount(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(split(text, " ")).cast("long")

  /** Token/char counting: whitespace tokens, distinct tokens, average
    * token length (derived from char math so both engines agree). */
  def tokenStats(documents: DataFrame): DataFrame =
    byDoc(documents)
      .withColumn("n_chars_calc", length(col("text")).cast("long"))
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("n_distinct_tokens",
        size(array_distinct(split(col("text"), " "))).cast("long"))
      .withColumn("avg_token_len",
        (col("n_chars_calc") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .select("doc_id", "n_chars", "n_chars_calc", "n_tokens",
        "n_distinct_tokens", "avg_token_len")

  /** Text normalization — the canonicalization pass an LLM-data pipeline
    * runs before dedup/quality/tokenization: lowercase, non-alphanumerics
    * to spaces, whitespace collapsed, trimmed. Emits the md5 of the
    * normalized text (narrow, engine-comparable) plus its token count;
    * idempotent by construction (normalize∘normalize = normalize,
    * specced). The three-op expression chain (lower + two regexp_replace
    * traversals) is fused into the one-pass native normalize_text kernel
    * (KernelPropertySpec pins kernel ≡ chain; the DuckDB twin — shared
    * Java/RE2 character-class syntax — stays bit-exact). Per-row
    * expression work — scales at scan speed. */
  def normalize(documents: DataFrame): DataFrame =
    byDoc(documents)
      .withColumn("norm_text",
        org.apache.spark.sql.graft.ColumnBridge.normalizeText(col("text")))
      .withColumn("n_tokens_norm", tokenCount(col("norm_text")))
      .withColumn("norm_md5", md5(col("norm_text").cast("binary")))
      .select("doc_id", "norm_md5", "n_tokens_norm")

  /** Column stage behind [[qualityScore]] (and the one-pass [[curate]]):
    * adds n_tokens / alpha_ratio / stop_ratio / score / quality_band,
    * preserving the input columns. Pure per-row work; the three text
    * counts (token count, alpha chars, stopword hits) come from the
    * one-pass native quality_counts kernel — the retired chain paid one
    * regex traversal plus two token-array materializations and an
    * interpreted 6-way-isin filter per row (KernelPropertySpec pins
    * kernel ≡ chain; n_tokens is bit-equal to [[tokenCount]], so the
    * budget unit stays engine-wide). */
  private[graft] def withQuality(df: DataFrame): DataFrame = {
    val nChars  = length(col("text")).cast("long")
    val qc = org.apache.spark.sql.graft.ColumnBridge
      .qualityCounts(col("text"), stopwords)
    df
      .withColumn("__qc", qc)
      .withColumn("n_tokens", col("__qc").getField("n_tokens"))
      .withColumn("alpha_ratio",
        col("__qc").getField("alpha").cast("double") / nChars)
      .withColumn("stop_ratio",
        col("__qc").getField("n_stop").cast("double") / col("n_tokens"))
      .drop("__qc")
      .withColumn("score",
        lit(0.5) * col("alpha_ratio")
          + lit(0.3) * (lit(1.0) - col("stop_ratio"))
          + lit(0.2) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)))
      .withColumn("quality_band",
        when(col("score") >= 0.8, "high")
          .when(col("score") >= 0.6, "medium")
          .otherwise("low"))
  }

  /** Quality scoring: alphabetic ratio, stopword ratio, length saturation →
    * composite score + band. The weighted formula is written in one fixed
    * associativity shape shared with the oracle SQL. */
  def qualityScore(documents: DataFrame): DataFrame =
    withQuality(byDoc(documents))
      .select("doc_id", "n_tokens", "alpha_ratio", "stop_ratio", "score",
        "quality_band")

  /** Regex tokenization counts — the BPE-ish view: alphabetic runs,
    * greedy ≤4-char subword chunks (a fixed-width stand-in for BPE merges)
    * and non-space tokens. Pure regexp_extract_all expression work. */
  def regexTokenStats(documents: DataFrame): DataFrame =
    // r20 (optimization round): regexp_count replaces
    // size(regexp_extract_all(..)) — the same non-overlapping
    // java.util.regex find() loop and therefore the same counts, but it
    // never materializes the matched substrings (the extract_all form
    // allocated an UTF8String array per row per pattern just to take its
    // length). Values are unchanged (oracle-gated).
    byDoc(documents)
      .withColumn("n_alpha_runs",
        regexp_count(col("text"), lit("[a-z]+")).cast("long"))
      .withColumn("n_bpe_chunks",
        regexp_count(col("text"), lit("[a-z]{1,4}")).cast("long"))
      .withColumn("n_nonspace",
        regexp_count(col("text"), lit("[^ ]+")).cast("long"))
      .select("doc_id", "n_alpha_runs", "n_bpe_chunks", "n_nonspace")

  /** Language ID by character-n-gram profile scoring: each candidate
    * language has a small trigram/stopword profile; the doc is scored per
    * language as (profile hits / tokens) and argmax wins. A heuristic
    * n-gram identifier in the spirit of compact LID models — per-row
    * expressions only, so it distributes trivially.
    *
    * NOTE: the corpus's `lang` labels are random w.r.t. its shared
    * vocabulary (all languages draw the same 31 words), so accuracy is
    * validated on synthetic multilingual text in LlmOpsSpec instead.
    */
  def languageId(documents: DataFrame): DataFrame = {
    val profiles: Map[String, Seq[String]] = Map(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
      "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
      "es" -> Seq("el", "la", "que", "de", "los", "es", "una", "por"),
      "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "des"),
      "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "不"))
    val toks = split(col("text"), " ")
    val scores = profiles.map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
      struct((hits.cast("double") / size(toks)).as("score"), lit(lang).as("lang"))
    }.toSeq
    // argmax via greatest over (score, lang) structs; ties break on the
    // lexicographically-largest language code — deterministic.
    val best = greatest(scores: _*)
    byDoc(documents)
      .withColumn("predicted_lang", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
      .select("doc_id", "lang", "predicted_lang", "lang_score")
  }

  /** PII patterns shared verbatim with the DuckDB oracle — restricted to
    * the regex subset where Java's engine and RE2 agree exactly (literal
    * char classes, bounded repetition, no backtracking constructs). Order
    * matters for redaction: URLs first (they swallow embedded host
    * emails), then emails, IPs, phone numbers — fixed here and in the
    * twin SQL. */
  private[graft] val piiPatterns: Seq[(String, String, String)] = Seq(
    ("url",   "https?://[^ ]+",                                  "<URL>"),
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip",    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}",                      "<PHONE>"))

  /** PII scan + redaction — the scrubbing pass a training-data pipeline
    * runs before a corpus ships: count email / phone / IPv4 / URL matches
    * per document (on the raw text) and emit the md5 of the text with all
    * four classes redacted in a fixed order. Counts are detection
    * telemetry; the digest pins the exact redacted bytes cross-engine.
    * Pure per-row regexp expression work — no shuffle, scan-speed, and
    * the real redacted text is one `select` away (the digest keeps the
    * query key narrow). */
  def piiScan(documents: DataFrame): DataFrame = {
    val redacted = piiPatterns.foldLeft(col("text")) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    withPiiCounts(byDoc(documents))
      .withColumn("redacted_md5", md5(redacted.cast("binary")))
      .select("doc_id", "n_email", "n_phone", "n_ip", "n_url", "n_pii",
        "redacted_md5")
  }

  /** Column stage behind [[piiScan]] (and [[curate]]): adds the four
    * per-class match counts and their `n_pii` total. */
  private[graft] def withPiiCounts(df: DataFrame): DataFrame =
    piiPatterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name",
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long"))
    }.withColumn("n_pii",
      col("n_url") + col("n_email") + col("n_ip") + col("n_phone"))

  /** The redacted text itself (same patterns/order as [[piiScan]]) — the
    * form a pipeline materializes when it rewrites the corpus. */
  def redact(documents: DataFrame): DataFrame = {
    val redacted = piiPatterns.foldLeft(col("text")) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    documents.withColumn("text_redacted", redacted)
  }

  /** Top-k token n-gram frequencies across the corpus — the vocabulary /
    * phrase profile a training-data pipeline reports. Classic word-count
    * shape: per-row n-gram explode, hash aggregate with map-side partial
    * counts (the shuffle carries one row per distinct n-gram per
    * partition, not per occurrence), deterministic top-k via
    * TakeOrderedAndProject. */
  def ngramFrequencies(documents: DataFrame, n: Int = 2, k: Int = 50): DataFrame = {
    documents
      .select(explode(org.apache.spark.sql.graft.ColumnBridge
        .wordNGrams(col("text"), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)
  }

  /** Corpus-LM fluency scoring — the quality signal CCNet-style pipelines
    * compute with a reference language model: documents whose n-grams are
    * COMMON across the corpus read as fluent/natural, documents built from
    * rare or garbled n-grams score low and get filtered (or routed to a
    * heavier quality model). Here the "LM" is the corpus's own bigram
    * table, and the score an exact arithmetic mean of corpus-wide bigram
    * frequencies — integers plus ONE double division, so the oracle
    * reproduces it bit-for-bit (a log-perplexity variant would hit libm
    * differences between engines; the mean-frequency form ranks documents
    * identically for the filter's purpose).
    *
    * Shape at scale — Zipf-proof two-phase count + gated join. Natural-
    * language gram frequency is Zipfian (the top bigram is ~1% of ALL
    * gram occurrences), so any plan that routes raw occurrences of one
    * gram to one task — a count-over-gram window (the r14 shape), or an
    * occurrence-level shuffle join — concentrates terabytes on a single
    * task at corpus scale. This form keeps every gram-keyed boundary
    * partially aggregated:
    *
    *   1. `token_term_counts` collapses within-document repetition in
    *      the row (one codegen pass, no shuffle): the probe stream is
    *      one (doc_id, gram, tf) row per DISTINCT gram per document, so
    *      a gram's row count anywhere downstream is its document
    *      frequency, never its occurrence count.
    *   2. The model is a plain `groupBy(gram).sum(tf)` — hash aggregation
    *      with map-side partial combine, so a Zipf-hot gram ships at most
    *      one partial row per map task into the exchange.
    *   3. The model joins back under the heap-derived broadcast budget
    *      ([[MinHashLsh.maybeBroadcast]]): below it (any realistic
    *      vocabulary — bigram vocabularies grow sub-linearly, Heaps'
    *      law) the probe never shuffles by gram at all and rolls
    *      straight into the per-doc aggregate; past it, the fallback is
    *      one df-bounded shuffle join that AQE's skew-join splitting
    *      handles, not an unsplittable window partition.
    *
    * The broadcast gate never guesses in the OOM direction. Tier 1 is
    * a job-free upper bound from plan statistics: model bytes ≤
    * uncompressed text bytes × ~17 (each text byte yields <1 gram
    * occurrence; a vocab row costs ≤ 2·tokLen+1 gram bytes + 32 B row
    * overhead, ≤17× its source text even at 1-char tokens) × 3 for
    * parquet text compression — if even that gross bound clears the
    * budget, broadcast with zero sizing work (every corpus whose raw
    * text is ~10× smaller than executor heap). Past tier 1 the model is
    * materialized ONCE (eager localCheckpoint — vocabulary-bounded, one
    * corpus pass that the join then reuses instead of recomputing) and
    * the decision reads its REAL size with a block-local vocab-sized
    * aggregate: sampling can't size a vocabulary — docs × mean distinct
    * grams/doc over-counts sharing ~250× on this corpus and routed sf10
    * to the shuffle join, while extrapolating a prefix sample UNDER-
    * counts sharded/salted corpora and would OOM at scale. Callers that
    * already know their model size pass `modelBytesHint` and skip all
    * sizing.
    *
    * Measured (r15, same-session head-to-head vs the r14 window form):
    * sf0.1 0.45 s in the committed full-run record (r14: 0.43), sf1
    * 1.03 vs 0.92 s, sf10 3.99 vs 3.61 s — inside the box's ±15-25 %
    * band at every scale, with the single-task Zipf ceiling gone and
    * the sf1→sf10 slope at 3.9×. Documents shorter than
    * `n` tokens keep word_ngrams' one truncated gram (the
    * tx_ngram_freq contract), so every document stays in the quality
    * report. */
  def lmScore(documents: DataFrame, n: Int = 2,
      modelBytesHint: Option[Long] = None): DataFrame = {
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    val tc = bridge.termCounts(bridge.wordNGrams(col("text"), n))
    val probe = documents
      .select(col("doc_id"), explode(tc).as("tg"))
      .select(col("doc_id"), col("tg.term").as("gram"), col("tg.tf").as("tf"))
    val model = probe.groupBy("gram").agg(sum(col("tf")).as("gram_freq"))
    val statBound = documents.queryExecution.optimizedPlan.stats.sizeInBytes * 51
    val gated = modelBytesHint match {
      case Some(bytes) => MinHashLsh.maybeBroadcast(model, bytes)
      case None if statBound <= MinHashLsh.maxBroadcastVerifyBytes(documents) =>
        broadcast(model)
      case None =>
        val mat = model.localCheckpoint(true)
        val stat = mat.agg(count(lit(1)).as("rows"),
          sum(length(col("gram"))).as("gramBytes")).head()
        val bytes =
          if (stat.isNullAt(1)) 0L
          else stat.getLong(0) * 48L + stat.getLong(1)
        MinHashLsh.maybeBroadcast(mat, bytes)
    }
    probe.join(gated, "gram")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_grams"),
        sum(col("tf") * col("gram_freq")).as("sum_freq"))
      .withColumn("avg_gram_freq",
        col("sum_freq").cast("double") / col("n_grams"))
      .select("doc_id", "n_grams", "sum_freq", "avg_gram_freq")
      .orderBy("doc_id")
  }

  /** Repetition signals — the within-document repetition filters of the
    * Gopher/MassiveText quality rules: the fraction of all token 2-grams
    * claimed by the single most frequent 2-gram, and the fraction of
    * tokens claimed by the most frequent token. Repetitive boilerplate
    * (template spam, scraper loops) scores high and gets flagged.
    *
    * Computed entirely per-row (distinct-gram × gram count inside array
    * expressions — documents are bounded, the corpus is not, so the
    * quadratic term stays in the row while the job stays shuffle-free at
    * scan speed). Counts are integers and the fractions single divisions,
    * so the DuckDB twin reproduces them bit-for-bit. */
  def repetitionSignals(documents: DataFrame, top2Max: Double = 0.18,
      topTokMax: Double = 0.3): DataFrame =
    withRepetition(byDoc(documents), top2Max, topTokMax)
      .select("doc_id", "n_tokens", "n_2grams", "top_token_count",
        "top_2gram_count", "top_token_fraction", "top_2gram_fraction",
        "repetitive")

  /** Column stage behind [[repetitionSignals]] (and [[curate]]): adds the
    * repetition counts/fractions and `repetitive`, preserving the input
    * columns (n_tokens is (re)computed from the same expression the
    * quality stage uses, so stacking the stages is idempotent). */
  private[graft] def withRepetition(df: DataFrame, top2Max: Double,
      topTokMax: Double): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = org.apache.spark.sql.graft.ColumnBridge
      .wordNGrams(col("text"), 2)
    // mode count via the single-pass token_term_counts kernel (O(n) per
    // doc) + an O(distinct) int max — the former
    // array_max(transform(distinct, g -> size(filter(...)))) chain was
    // O(n·d) interpreted-HOF work per document and dominated the curate
    // gate's real cost (~2.9 s → ~0.9 s for the gate pass at sf0.1)
    def topCount(arr: org.apache.spark.sql.Column) =
      array_max(transform(
        org.apache.spark.sql.graft.ColumnBridge.termCounts(arr),
        tt => tt.getField("tf")))
    df
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_2grams", size(grams).cast("long"))
      .withColumn("top_token_count", topCount(toks).cast("long"))
      .withColumn("top_2gram_count", topCount(grams).cast("long"))
      .withColumn("top_token_fraction",
        col("top_token_count").cast("double") / col("n_tokens"))
      .withColumn("top_2gram_fraction",
        col("top_2gram_count").cast("double") / col("n_2grams"))
      .withColumn("repetitive",
        col("top_2gram_fraction") > top2Max
          || col("top_token_fraction") > topTokMax)
  }

  /** Per-document salient terms — tf·idf keyword extraction, the ranking
    * pass behind corpus topic profiling, near-dup triage and retrieval
    * indexing. Emits each document's top-`k` distinct terms by
    * tf · (N / df): term frequency from ONE single-pass codegen kernel
    * over the token array (token_term_counts — O(n) per document; the
    * former per-distinct-term `size(filter(...))` chain was O(n·d),
    * quadratic on natural text), document frequency from one
    * map-side-combined count over the same distinct (doc, term) rows, N
    * broadcast as a single-row count.
    * The idf is the LINEAR form N/df rather than log(N/df): the ranking a
    * filter consumes is order-isomorphic for fixed tf (both decrease in
    * df), and the score stays two IEEE ops (one divide, one multiply) so
    * the DuckDB oracle reproduces it bit-for-bit — a log would hit libm
    * rounding differences between engines (SURVEY §4).
    *
    * Shape at scale: explode distinct terms (one row per (doc, term)), df
    * aggregate, term join, and the per-doc top-k window — three shuffles,
    * all on narrow (doc_id, term, counts) rows; ties break on the term
    * string so any cut is deterministic. */
  def salientTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    val termRows = documents.select(col("doc_id"),
        explode(org.apache.spark.sql.graft.ColumnBridge.termCounts(toks))
          .as("tt"))
      .select(col("doc_id"), col("tt.term").as("term"), col("tt.tf").as("tf"))
    // df = docs containing the term = one count over termRows, which is
    // already one row per (doc, distinct term) — no second tokenize pass
    val dfTab = termRows.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = documents.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = termRows.join(dfTab, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") * (col("n_docs") / col("df").cast("double")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "tfidf")
      .orderBy("doc_id", "rank")
  }

  /** Corpus-level boilerplate mining — n-grams shared VERBATIM across
    * many documents (template headers, nav chrome, scraper artifacts):
    * the cross-document complement of [[repetitionSignals]], and the list
    * a pipeline strips before training. Distinct-per-doc grams (one vote
    * per document) explode into a count roll-up with map-side partials —
    * the shuffle carries one row per distinct gram per partition, not per
    * occurrence — thresholded at `minDocs`. Word-count shape: scales like
    * tx_ngram_freq at any corpus size. BREAKING in round 7: the default
    * changed from `topK = 1000` to the FULL ≥minDocs template set —
    * callers that relied on the old bounded default must now pass
    * `topK = 1000` explicitly. Pass `topK` to bound the output, and
    * the ordering then plans as TakeOrderedAndProject (a per-partition
    * top-k heap + one k-row merge on the driver) instead of a full sort
    * of every surviving gram — at corpus scale the surviving template
    * set is unbounded, so bounded callers (the tx_boilerplate key passes
    * 1000) get the scale-safe plan. Ties break on the gram itself, so
    * any cut is deterministic. */
  def boilerplate(documents: DataFrame, n: Int = 3, minDocs: Int = 5,
      topK: Int = Int.MaxValue): DataFrame = {
    val ranked = Contamination.gramSets(documents, n)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("gram"))
    // limit(Int.MaxValue) would still plan a driver-side k-row merge
    // with k = 2^31 — only bound when the caller actually bounded
    if (topK == Int.MaxValue) ranked else ranked.limit(topK)
  }

  /** One-pass corpus curation gate — the composed filter an LLM data
    * pipeline runs before training: quality score, repetition filter and
    * PII counts stacked over a SINGLE scan. Every stage is a per-row
    * expression chain, so Catalyst fuses the whole gate into one
    * whole-stage-codegen pass: curating 100 TB costs one read of the
    * corpus, not one sweep per signal (plan pinned — no exchange, one
    * scan). `keep` = medium-or-better quality AND not repetitive; PII
    * rides along as telemetry for the downstream redaction pass. */
  def curate(documents: DataFrame, minScore: Double = 0.6,
      top2Max: Double = 0.18, topTokMax: Double = 0.3): DataFrame =
    withPiiCounts(withRepetition(withQuality(byDoc(documents)), top2Max, topTokMax))
      .withColumn("keep", col("score") >= minScore && !col("repetitive"))
      .select("doc_id", "score", "quality_band", "repetitive", "n_pii", "keep")

  /** The curation gate as a FILTER over the full document rows — the
    * form the assembly pipeline consumes: same one-scan per-row
    * expression chain as [[curate]], but instead of projecting the
    * telemetry columns it keeps the surviving documents with their
    * original schema (so downstream mixture / epoch / shard stages see
    * a normal corpus). The gate predicate fuses into the scan: curating
    * is free-riding on the first read of the corpus, never a join back.
    */
  def curateKeep(documents: DataFrame, minScore: Double = 0.6,
      top2Max: Double = 0.18, topTokMax: Double = 0.3): DataFrame =
    withPiiCounts(withRepetition(withQuality(documents), top2Max, topTokMax))
      .filter(col("score") >= minScore && !col("repetitive"))
      .select(documents.columns.map(col): _*)

  /** Corpus mixture report — docs / tokens / chars per (source, language)
    * cell plus each cell's document share: the table a pipeline consults
    * to set per-source sampling rates (see Sampling.stratifiedSample).
    * Classic partial-agg roll-up: ONE corpus pass and one shuffle over
    * (source, lang) cells; the share denominator is a window-over-all on
    * the aggregated cells — post-agg rows bounded by distinct cells, so
    * the single-partition window costs nothing at any corpus size (and
    * the corpus is never scanned twice). */
  def corpusStats(documents: DataFrame): DataFrame = {
    val cells = documents
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("doc_share",
        col("n_docs").cast("double") / sum(col("n_docs")).over(all))
      .select("source", "lang", "n_docs", "total_tokens", "total_chars",
        "doc_share")
      .orderBy("source", "lang")
  }

  /** Winnowing-style document fingerprint sets: Karp-Rabin polynomial
    * rolling hashes of token k-shingles, keep each window's minimum → a
    * compact, shift-tolerant signature set (sorted canonical order).
    *
    * The hash is plain modular polynomial arithmetic over character codes
    * ((acc·131 + c) mod 1000003 per char, (acc·8191 + h) mod 1000003 per
    * token-in-shingle) — deliberately engine-neutral so any SQL engine can
    * reproduce the exact fingerprints, unlike an engine-private murmur3.
    * All per-row expression work: no shuffle, scan-speed at any corpus
    * size. */
  def fingerprintSets(documents: DataFrame, k: Int = 3, window: Int = 4): DataFrame =
    // ONE native pass (winnow_fingerprint kernel): the former expression
    // chain ran interpreted per-CHARACTER lambdas (split(t, "") + ascii
    // + aggregate per token, per shingle, per window) — its real
    // evaluated cost was 28.5 s at sf0.1 once the bench stopped letting
    // count() prune it; the kernel is the same arithmetic as one tight
    // loop (equivalence property-specced, oracle unchanged)
    documents.withColumn("fingerprint",
      org.apache.spark.sql.graft.ColumnBridge
        .winnowFingerprint(col("text"), k, window))

  /** Query view of the fingerprint: scalar md5 digest of the sorted
    * fingerprint set + set size — flat, orderable columns that any
    * downstream store (or the correctness oracle) can compare directly. */
  def fingerprint(documents: DataFrame, k: Int = 3, window: Int = 4): DataFrame =
    fingerprintSets(byDoc(documents), k, window)
      .withColumn("fp_digest",
        md5(concat_ws(",", transform(col("fingerprint"), x => x.cast("string")))
          .cast("binary")))
      .withColumn("fp_size", size(col("fingerprint")).cast("long"))
      .select("doc_id", "fp_digest", "fp_size")
}
