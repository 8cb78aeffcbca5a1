package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.sources.Tables

class LlmOpsSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf).cache()

  test("exact dedup collapses injected duplicates to one canonical id") {
    val base = Seq(
      (1L, "alpha beta gamma", "s1"),
      (2L, "alpha beta gamma", "s1"),     // exact dup of 1
      (3L, "gamma beta alpha alpha", "s1"), // token-set dup of 1
      (4L, "totally different words", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.exact(base).collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Long]("canonical_id") === 1L)
    assert(out(1).getAs[Long]("canonical_id") === 1L)
    assert(out(2).getAs[Long]("canonical_id") === 1L) // normalized dup
    assert(out(3).getAs[Long]("canonical_id") === 4L)
    assert(out(1).getAs[Boolean]("is_duplicate"))
    assert(!out(0).getAs[Boolean]("is_duplicate"))
  }

  test("jaccard pairs are symmetric-free, thresholded, within source") {
    val pairs = Dedup.ngramJaccard(docs, 0.5).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("jaccard of identical token sets is 1.0") {
    val two = Seq((1L, "x y z", "s"), (2L, "z y x", "s")).toDF("doc_id", "text", "source")
    val p = Dedup.ngramJaccard(two, 0.9).collect()
    assert(p.length === 1 && p.head.getAs[Double]("jaccard") === 1.0)
  }

  test("brute-force top-k is sorted descending and excludes the query") {
    val top = Similarity.bruteForceTopK(Tables.embeddings(spark, sf), 0L, 10).collect()
    assert(top.length === 10)
    assert(!top.exists(_.getAs[Long]("vec_id") == 0L))
    val cos = top.map(_.getAs[Double]("cosine"))
    assert(cos.sameElements(cos.sorted.reverse))
  }

  test("token stats: n_chars matches metadata column") {
    val ts = TextAnalysis.tokenStats(docs)
    assert(ts.filter(col("n_chars") =!= col("n_chars_calc")).count() === 0)
    assert(ts.filter(col("n_distinct_tokens") > col("n_tokens")).count() === 0)
  }

  test("quality score is in [0,1] and bands are consistent") {
    val q = TextAnalysis.qualityScore(docs)
    assert(q.filter(col("score") < 0 || col("score") > 1).count() === 0)
    assert(q.filter(col("quality_band") === "high" && col("score") < 0.8).count() === 0)
  }

  test("langid identifies synthetic multilingual samples") {
    val samples = Seq(
      (1L, "the cat sat and the dog is in the house of it", "en"),
      (2L, "der hund ist nicht in das haus und die katze", "de"),
      (3L, "el perro es una mascota que vive por la casa de los gatos", "es"),
      (4L, "le chien est une bete et les chats sont des amis", "fr"),
      (5L, "我 是 他 的 朋友 他 有 不 在 了", "zh"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.languageId(samples).collect()
    out.foreach { r =>
      assert(r.getAs[String]("predicted_lang") === r.getAs[String]("lang"),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("fingerprint is identical for identical docs, differs for different docs") {
    val three = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "q r s t u v w x y z"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(three).collect().sortBy(_.getLong(0))
    assert(fp(0).getAs[String]("fp_digest") === fp(1).getAs[String]("fp_digest"))
    assert(fp(0).getAs[String]("fp_digest") !== fp(2).getAs[String]("fp_digest"))
    assert(fp.forall(_.getAs[Long]("fp_size") > 0))
  }

  test("fingerprint shares hashes under content shift (winnowing property)") {
    val shifted = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "zz a b c d e f g h i j"))  // same content, one-token prefix
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprintSets(shifted).collect().sortBy(_.getLong(0))
    val s1 = fp(0).getAs[scala.collection.Seq[Long]]("fingerprint").toSet
    val s2 = fp(1).getAs[scala.collection.Seq[Long]]("fingerprint").toSet
    assert(s1.intersect(s2).nonEmpty)
  }

  test("multimodal: binary payload round-trips and features are normalized") {
    val mm = Multimodal.binaryColumns(docs)
    assert(mm.filter(col("n_bytes") =!= length(col("payload"))).count() === 0)
    val feats = Multimodal.extractFeatures(mm).collect()
    assert(feats.length === docs.count())
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // histogram normalized
    }
  }

  test("multimodal: resize preserves mass, frame sampling tiles the payload") {
    val mm = Multimodal.binaryColumns(docs)
    val counts = Multimodal.extractFeatures(mm, 16).toDF()
      .select(col("doc_id"), col("n_bytes"),
        transform(col("features"),
          f => f.cast("double") * col("n_bytes")).as("counts"))
    val resized = Multimodal.resizeFeatures(counts, "counts", 4)
    // re-binning is mass-preserving: both vectors sum to n_bytes
    val bad = resized.filter(
      abs(aggregate(col("counts_resized"), lit(0.0d), (a, b) => a + b)
        - col("n_bytes").cast("double")) > 1e-3)
    assert(bad.count() === 0)
    assert(resized.filter(size(col("counts_resized")) =!= 4).count() === 0)
    // frames: stride-64 windows cover each payload exactly once
    val frames = Multimodal.frameSample(mm, frameLen = 16, stride = 64).toDF()
    val perDoc = frames.groupBy("doc_id").agg(
      count(lit(1)).as("n_frames"), max(col("off_bytes")).as("last_off"))
      .join(mm.select("doc_id", "n_bytes"), "doc_id")
    assert(perDoc.filter(
      col("n_frames") =!= ceil(col("n_bytes").cast("double") / 64).cast("long"))
      .count() === 0)
    assert(perDoc.filter(col("last_off") >= col("n_bytes")).count() === 0)
  }

  test("stub decode is deterministic") {
    val bytes = "hello world".getBytes("UTF-8")
    assert(Multimodal.stubDecode(bytes, 8).toSeq === Multimodal.stubDecode(bytes, 8).toSeq)
  }

  test("multimodal byte semantics hold on non-ASCII payloads (r18)") {
    // ScaleUp's salted sf1 corpus is NOT pure ASCII — the r17 sf1 oracle
    // run caught the char-based twins red on it. Pin the BYTE contract
    // on a multi-byte doc: 'é' is 2 UTF-8 bytes (0xC3 0xA9), so chars
    // and bytes diverge everywhere below.
    val text = ("café " * 30).trim // 149 chars, 179 bytes
    val bytes = text.getBytes("UTF-8")
    assert(text.length === 149 && bytes.length === 179)
    val mm = Multimodal.binaryColumns(
      Seq((1L, text, "s")).toDF("doc_id", "text", "source"))
    // n_bytes is the BYTE length
    assert(mm.select("n_bytes").head().getLong(0) === 179L)
    // feature counts are a BYTE histogram: 0xC3 % 16 = 3, 0xA9 % 16 = 9
    val counts = Multimodal.extractFeatures(mm, 16)
      .collect().head.counts
    assert(counts.sum === 179L)
    assert(counts(3) >= 30 && counts(9) >= 30,
      s"multi-byte UTF-8 bytes missing from the histogram: ${counts.toSeq}")
    // frames cut at BYTE offsets: ceil(179/64) = 3 frames, and each
    // digest is md5 of the window's UPPERCASE-HEX rendering — the form
    // a VARCHAR-only oracle can replay even when the window splits a
    // multi-byte character (offset 64 lands mid-payload)
    val frames = Multimodal.frameSample(mm).collect().sortBy(_.frame_no)
    assert(frames.length === 3)
    assert(frames.map(_.off_bytes).toSeq === Seq(0L, 64L, 128L))
    val md = java.security.MessageDigest.getInstance("MD5")
    frames.foreach { f =>
      val off = f.off_bytes.toInt
      val window = java.util.Arrays.copyOfRange(bytes, off,
        math.min(off + 16, bytes.length))
      val hexStr = window.map("%02X".format(_)).mkString
      md.reset()
      val want = md.digest(hexStr.getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString
      assert(f.frame_md5 === want,
        s"frame ${f.frame_no}: digest is not md5(uppercase-hex(window))")
    }
  }

  test("pii scan counts planted PII and redacts it in order") {
    val planted = Seq(
      (1L, "contact me at jane.doe@example.com or 555-123-4567 today", "s"),
      (2L, "server 10.0.0.1 logs to https://logs.example.com/x?id=1 hourly", "s"),
      // the URL swallows its embedded email: redacted FIRST, so the email
      // count (raw text) sees it but the redaction replaces the whole URL
      (3L, "see https://u@host.com/path and mail u@host.com", "s"),
      (4L, "no personal data here at all", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.piiScan(planted).collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Long]("n_email") === 1L)
    assert(out(0).getAs[Long]("n_phone") === 1L)
    assert(out(1).getAs[Long]("n_ip") === 1L)
    assert(out(1).getAs[Long]("n_url") === 1L)
    assert(out(2).getAs[Long]("n_url") === 1L)
    assert(out(2).getAs[Long]("n_email") === 2L) // raw-text counts see both
    assert(out(3).getAs[Long]("n_pii") === 0L)
    val red = TextAnalysis.redact(planted).collect().sortBy(_.getLong(0))
      .map(_.getAs[String]("text_redacted"))
    assert(red(0) === "contact me at <EMAIL> or <PHONE> today")
    assert(red(1) === "server <IP> logs to <URL> hourly")
    assert(red(2) === "see <URL> and mail <EMAIL>")
    assert(red(3) === "no personal data here at all")
    // idempotent: redacting redacted text changes nothing
    val again = TextAnalysis.redact(
      planted.select(col("doc_id"),
        col("text"), col("source"))).withColumn("text", col("text_redacted"))
      .drop("text_redacted")
    val twice = TextAnalysis.redact(again).collect().sortBy(_.getLong(0))
    assert(twice.map(_.getAs[String]("text_redacted")).toSeq === red.toSeq)
  }

  test("contamination: verbatim benchmark copy flags, disjoint text doesn't") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta", "b"))
      .toDF("doc_id", "text", "source")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s"),  // verbatim copy
      (2L, "totally unrelated words only here", "s"),     // disjoint
      (3L, "alpha beta gamma delta unrelated tail words", "s")) // partial
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Contamination.scan(corpus, bench, n = 3, threshold = 0.5)
      .collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Double]("contamination") === 1.0)
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Long]("n_overlap") === 0L)
    assert(!out(1).getAs[Boolean]("contaminated"))
    assert(out(2).getAs[Double]("contamination") > 0.0
      && out(2).getAs[Double]("contamination") < 1.0)
  }

  test("sampling is nested: raising the rate only ever adds rows") {
    import graft.operators.Sampling
    // key%100 < pct is monotone in pct, so samples at increasing rates
    // form a chain — the property that makes scaling studies reproducible
    // (the 10% sample is a subset of the 20% sample, etc.)
    val ids = Seq(5, 10, 20, 50, 100).map { pct =>
      pct -> Sampling.uniformSample(docs, "doc_id", pct)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    ids.sliding(2).foreach { case Seq((p1, s1), (p2, s2)) =>
      assert(s1.subsetOf(s2), s"sample at $p1% must nest inside $p2%")
    }
    // rates are monotone in size and exact at the extremes
    assert(ids.map(_._2.size) === ids.map(_._2.size).sorted)
    assert(ids.last._2.size.toLong === docs.count())
  }

  test("containment stays exact under a planted gram-hash collision (string fallback)") {
    // "a" and "ba" collide in the engine-neutral 64-bit token hash
    // (both 31-poly folds give 3135 before the bijective finisher), and
    // the collision survives equal-length substitution inside a longer
    // string — so the GRAMS "w2 a w4" and "w2 ba w4" collide too.
    // The hashed verify would see doc 0 fully contained in doc 1; the
    // injectivity proof must detect the collision and re-verify on the
    // gram strings
    val w = (1 to 10).map(i => s"w$i")
    val textA = (w.take(2) :+ "a") ++ w.drop(3)
    val textB = (w.take(2) :+ "ba") ++ w.drop(3)
    val pair = Seq(
      (0L, textA.mkString(" ")),
      (1L, textB.mkString(" "))).toDF("doc_id", "text")
    // 10 tokens -> 8 grams; 3 involve the colliding token, 5 shared:
    // true containment 5/8 = 0.625, hashed would read 8/8 = 1.0
    val strict = Dedup.containment(pair, 0.95).collect()
    assert(strict.isEmpty,
      s"collision inflated the containment verify: ${strict.mkString(",")}")
    val loose = Dedup.containment(pair, 0.6).collect()
      .map(r => ((r.getAs[Long]("contained_id"), r.getAs[Long]("container_id")),
        (r.getAs[Long]("n_common"), r.getAs[Double]("containment")))).toMap
    assert(loose.keySet === Set((0L, 1L), (1L, 0L)))
    assert(loose((0L, 1L)) === ((5L, 0.625)))
  }

  test("containment: catches subset duplication Jaccard misses; equals exhaustive") {
    // B swallows A whole (plus 16 extra tokens): containment(A→B) = 1.0
    // while jaccard = 4/20 = 0.2 — structurally invisible to the
    // symmetric near-dup families
    val extra = (1 to 16).map(i => s"filler$i").mkString(" ")
    val base = Seq(
      (1L, "alpha beta gamma delta", "s"),
      (2L, s"alpha beta gamma delta $extra", "s"),
      (3L, "unrelated words entirely here", "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.containment(base, 0.9).collect()
      .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id")) -> r)
      .toMap
    assert(out.keySet === Set((1L, 2L))) // directional: A⊂B only, B⊄A
    assert(out((1L, 2L)).getAs[Double]("containment") === 1.0)
    assert(out((1L, 2L)).getAs[Long]("n_common") === 2L) // A's two 3-grams

    // prefix-filter completeness: identical to the exhaustive all-pairs
    // form on real documents (3-gram shingle sets, word_ngrams contract:
    // short docs yield one truncated gram)
    val docs001 = docs.limit(200).cache()
    val got = Dedup.containment(docs001, 0.8).collect()
      .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"),
        r.getAs[Long]("n_common")))
      .toSet
    def gramSet(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length <= 3) Set(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val tokSets = docs001.collect().map(r =>
      r.getAs[Long]("doc_id") -> gramSet(r.getAs[String]("text"))).toMap
    val want = (for {
      (ia, ta) <- tokSets; (ib, tb) <- tokSets if ia != ib
      common = (ta intersect tb).size.toLong
      if common * 100 >= 80 * ta.size.toLong
    } yield (ia, ib, common)).toSet
    assert(got === want)
    assert(want.nonEmpty, "exhaustive ground truth should find pairs here")
  }

  test("lm score: common-phrasing docs outrank garbled ones; mean is exact") {
    val base = Seq(
      (1L, "the quick brown fox", "s"),
      (2L, "the quick brown fox", "s"),
      (3L, "the quick brown fox", "s"),
      (4L, "zxq wvu tsr qpo", "s"),      // bigrams unique in the corpus
      (5L, "one", "s"))                  // short doc: one truncated gram
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.lmScore(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // short docs keep word_ngrams' one truncated gram (the same contract
    // as tx_ngram_freq / dd_contamination), so no document silently
    // vanishes from the quality report
    assert(out(5L).getAs[Long]("n_grams") === 1L)
    // docs 1-3 share every bigram (freq 3 each); doc 4's are singletons
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Double]("avg_gram_freq") === 3.0)
      assert(out(id).getAs[Long]("n_grams") === 3L)
    }
    assert(out(4L).getAs[Double]("avg_gram_freq") === 1.0)
    // the mean is sum/count exactly
    out.values.foreach { r =>
      assert(r.getAs[Double]("avg_gram_freq") ===
        r.getAs[Long]("sum_freq").toDouble / r.getAs[Long]("n_grams"))
    }
  }

  test("salient terms: rare terms outrank common ones, ties break on term") {
    val base = Seq(
      (1L, "common common common rare", "s"),
      (2L, "common other", "s"),
      (3L, "common other", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.salientTerms(base, k = 2).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // doc 1: 'rare' df=1 tf=1 → 3.0; 'common' df=3 tf=3 → 3.0; the tie
    // breaks lexicographically ('common' < 'rare')
    val d1 = out(1L).sortBy(_.getAs[Int]("rank"))
    assert(d1.map(_.getAs[String]("term")).toSeq === Seq("common", "rare"))
    assert(d1.map(_.getAs[Double]("tfidf")).toSeq === Seq(3.0, 3.0))
    // docs 2/3: 'other' (df=2, tf=1 → 1.5) beats 'common' (df=3 → 1.0)
    Seq(2L, 3L).foreach { id =>
      val rows = out(id).sortBy(_.getAs[Int]("rank"))
      assert(rows.map(_.getAs[String]("term")).toSeq === Seq("other", "common"))
      assert(rows.head.getAs[Double]("tfidf") === 1.5)
    }
    // every doc emits at most k rows with dense ranks from 1
    out.values.foreach { rows =>
      assert(rows.length <= 2)
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length))
    }
  }

  test("split assignment: exhaustive, disjoint, reproducible, stable holdouts") {
    import graft.operators.Sampling
    val out = Sampling.splitAssignments(docs).collect()
    // every doc gets exactly one split — the assignment partitions the corpus
    assert(out.length.toLong === docs.count())
    val bySplit = out.groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.map(_.length).sum === out.length)
    // reproducible: a second run yields bit-identical assignments
    val again = Sampling.splitAssignments(docs).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // a split's membership at p% contains its membership at q% < p —
    // growing the eval carve never swaps holdout rows, only adds
    val test2 = bySplit.getOrElse("test", Array.empty)
      .map(_.getAs[Long]("doc_id")).toSet
    val test6 = Sampling.splitAssignments(docs, testPct = 6).collect()
      .filter(_.getAs[String]("split") == "test")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(test2.subsetOf(test6))
    // guards: pcts must be sane
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id", Seq("a" -> 60, "b" -> 60))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id", Seq.empty)
    }
  }

  test("shuffle shards: a bijective permutation in shard-write order") {
    import graft.operators.Sampling
    val out = Sampling.shuffleShards(docs, nShards = 16).collect()
    // bijection: every doc appears exactly once
    assert(out.map(_.getAs[Long]("doc_id")).toSet.size.toLong === docs.count())
    // (shard, pos) is a dense rank: positions run 1..|shard| in every shard
    val byShard = out.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.forall(s => s >= 0 && s < 16))
    byShard.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq
        === (1L to rows.length.toLong))
      // within a shard, position order IS (sample_key, doc_id) order —
      // replaying shards in order replays the fixed permutation
      val inPos = rows.sortBy(_.getAs[Long]("pos"))
        .map(r => (r.getAs[Long]("sample_key"), r.getAs[Long]("doc_id")))
      assert(inPos.toSeq === inPos.sortBy(identity).toSeq)
    }
    // reproducible: a second run yields bit-identical placement
    val again = Sampling.shuffleShards(docs, nShards = 16).collect()
    assert(out.map(_.toSeq).sortBy(_.toString) ===
      again.map(_.toSeq).sortBy(_.toString))
    intercept[IllegalArgumentException] { Sampling.shuffleShards(docs, 0) }
  }

  test("mix to target: bottleneck source taken whole, rates replay exactly") {
    import graft.operators.Sampling
    val weights = Map("src0" -> 50, "src2" -> 30, "src4" -> 20)
    val out = Sampling.mixToTarget(docs, weights).collect()
    // only named sources survive
    assert(out.map(_.getAs[String]("source")).toSet.subsetOf(weights.keySet))
    // scala reference replay: per-source counts -> T* -> take -> rate_ppm
    val counts = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val wsum = weights.values.sum.toLong
    val tstar = counts.map { case (s, n) => n * wsum / weights(s) }.min
    val expected = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .select("doc_id", "source").collect().filter { r =>
        val s = r.getAs[String]("source")
        val take = weights(s).toLong * tstar / wsum
        val ratePpm = take * 1000000L / counts(s)
        (r.getAs[Long]("doc_id") * 48271L % 2147483647L) % 1000000L < ratePpm
      }.map(_.getAs[Long]("doc_id")).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet === expected)
    // the bottleneck source is taken whole up to ONE doc of floor
    // rounding (take ∈ {n_b−1, n_b}); on THIS corpus the bottleneck is
    // the w=50 source whose arithmetic divides, so the exact-whole case
    // (rate 1e6, every doc kept) is the deterministic expectation —
    // asserted via the replay, with the general band checked first
    val bottleneck = weights.minBy { case (s, w) => counts(s).toDouble / w }._1
    val takeB = weights(bottleneck).toLong * tstar / wsum
    assert(takeB === counts(bottleneck) || takeB === counts(bottleneck) - 1)
    val kept = out.filter(_.getAs[String]("source") == bottleneck)
    val rateB = takeB * 1000000L / counts(bottleneck)
    assert(kept.forall(_.getAs[Long]("rate_ppm") === rateB))
    assert(rateB === 1000000L && kept.length.toLong === counts(bottleneck),
      s"this corpus's w=50 bottleneck divides exactly; got rate $rateB")
    intercept[IllegalArgumentException] { Sampling.mixToTarget(docs, Map.empty) }
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(docs, Map("src0" -> 0))
    }
    // a named source absent from the corpus is ignored in T* (documented):
    // with {absent: 100, src0: 50} the feasible total is set by src0
    // alone, whose take works out to its full count — all rows kept
    val ghost = Sampling.mixToTarget(docs, Map("nosuchsrc" -> 100, "src0" -> 50))
      .collect()
    assert(ghost.map(_.getAs[String]("source")).toSet === Set("src0"))
    assert(ghost.length.toLong ===
      docs.filter(col("source") === "src0").count())
  }

  test("token mixture: rates derive from token mass and share the engine token unit") {
    import graft.operators.Sampling
    val weights = Map("src0" -> 50, "src2" -> 30, "src4" -> 20)
    val out = Sampling.mixToTokenTarget(docs, weights).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[String]("source")).toSet.subsetOf(weights.keySet))
    // scala reference replay in TOKEN units: per-source token sums ->
    // T* -> take_tokens -> rate_ppm -> Lehmer residue membership
    val wsum = weights.values.sum.toLong
    val perDoc = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .select(col("doc_id"), col("source"),
        graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens")))
    val tokS = perDoc.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    val tstar = tokS.map { case (s, t) => t * wsum / weights(s) }.min
    val expected = perDoc.filter { case (id, s, _) =>
      val take = weights(s).toLong * tstar / wsum
      val ratePpm = take * 1000000L / tokS(s)
      (id * 48271L % 2147483647L) % 1000000L < ratePpm
    }.map(_._1).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet === expected)
    // the TOKEN-bottleneck source is taken whole up to ONE token of
    // floor rounding (take ∈ {tok_b−1, tok_b} — see the scaladoc): its
    // take must sit in that band, and its rate must equal the exact
    // integer replay (1e6 when the divisions land exact — true here
    // only when the bottleneck's arithmetic divides; never assert the
    // lucky case). The bottleneck can differ from the doc-count one
    // when lengths skew by source.
    val bottleneck = weights.minBy { case (s, w) => tokS(s).toDouble / w }._1
    val takeB = weights(bottleneck).toLong * tstar / wsum
    assert(takeB === tokS(bottleneck) || takeB === tokS(bottleneck) - 1,
      s"bottleneck take $takeB outside {tok_b-1, tok_b} of ${tokS(bottleneck)}")
    val kept = out.filter(_.getAs[String]("source") == bottleneck)
    val rateB = takeB * 1000000L / tokS(bottleneck)
    assert(kept.forall(_.getAs[Long]("rate_ppm") === rateB))
    assert(rateB >= 1000000L - (1000000L + tokS(bottleneck) - 1) / tokS(bottleneck),
      s"bottleneck rate $rateB more than one token below whole")
    // n_tokens in the output IS TextAnalysis.tokenCount — one unit
    val official = perDoc.map(t => t._1 -> t._3).toMap
    assert(out.forall(r =>
      r.getAs[Long]("n_tokens") === official(r.getAs[Long]("doc_id"))))
  }

  test("epoch plan: repetition capped, partial epochs residue-selected, dense numbering") {
    import graft.operators.Sampling
    val weights = Map("src0" -> 50, "src2" -> 30, "src4" -> 20)
    val out = Sampling.epochPlan(docs, weights, budget = 150L, maxEpochs = 3)
      .collect()
    val counts = docs.filter(col("source").isin(weights.keys.toSeq: _*))
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val wsum = weights.values.sum.toLong
    // scala reference replay of the integer plan
    val plan = counts.map { case (s, n) =>
      val take = math.min(weights(s).toLong * 150L / wsum, n * 3L)
      s -> ((take / n, (take % n) * 1000000L / n))  // (full epochs, rate_ppm)
    }
    val byDoc = out.groupBy(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    byDoc.foreach { case ((id, src), rows) =>
      val (fullEp, ratePpm) = plan(src)
      val partial = (id * 48271L % 2147483647L) % 1000000L < ratePpm
      val expected = fullEp + (if (partial) 1L else 0L)
      // every emitted doc carries a DENSE epoch range 1..n_ep
      assert(rows.map(_.getAs[Long]("epoch")).sorted.toSeq
        === (1L to expected), s"doc $id in $src")
    }
    // docs with zero planned epochs are absent entirely (no epoch-0 rows)
    val perSrc = out.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length.toLong).toMap
    plan.foreach { case (s, (fullEp, _)) =>
      // total rows per source = full epochs × n + selected partials —
      // and never exceeds the repetition cap
      assert(perSrc.getOrElse(s, 0L) >= fullEp * counts(s))
      assert(perSrc.getOrElse(s, 0L) <= counts(s) * 3L, s"source $s over cap")
    }
    // no repetition cap hit -> a bigger budget repeats up to the cap
    val capped = Sampling.epochPlan(docs, Map("src0" -> 1), budget = 1000000L,
      maxEpochs = 2).collect()
    assert(capped.length.toLong === counts("src0") * 2L)
    intercept[IllegalArgumentException] {
      Sampling.epochPlan(docs, Map("src0" -> 1), budget = 0L)
    }
    intercept[IllegalArgumentException] {
      Sampling.epochPlan(docs, Map("src0" -> 1), budget = 10L, maxEpochs = 0)
    }
  }

  test("contamination: a corpus scanned against itself is fully contaminated") {
    val some = docs.filter(col("doc_id") < 50)
    val out = graft.operators.Contamination.scan(some, some).collect()
    assert(out.length === 50)
    assert(out.forall(_.getAs[Double]("contamination") === 1.0))
    assert(out.forall(_.getAs[Boolean]("contaminated")))
  }

  test("contamination: empty benchmark yields zero overlap in both forms") {
    val empty = docs.filter(lit(false))
    val a = graft.operators.Contamination.scan(docs, empty).collect()
    val b = graft.operators.Contamination.scanJoin(docs, empty).collect()
    assert(a.length.toLong === docs.count() && b.length === a.length)
    assert(a.forall(r => r.getAs[Long]("n_overlap") === 0L
      && !r.getAs[Boolean]("contaminated")))
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("contamination: broadcast scan == explode-join scan on real docs") {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val a = graft.operators.Contamination.scan(corpus, bench).collect()
    val b = graft.operators.Contamination.scanJoin(corpus, bench).collect()
    assert(a.length === b.length && a.nonEmpty)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // row-identity includes null-text documents: the scan keeps them
    // with null metrics, and the join shape must not drop them via its
    // explode (explode_outer + the carried size restores the row)
    val withNull = corpus.limit(5)
      .unionByName(spark.sql(
        "SELECT CAST(999999 AS BIGINT) AS doc_id, CAST(NULL AS STRING) AS text, " +
          "'srcx' AS source, CAST(0 AS BIGINT) AS n_chars, 'en' AS lang")
        .select(corpus.columns.map(col): _*))
    val an = graft.operators.Contamination.scan(withNull, bench).collect()
    val bn = graft.operators.Contamination.scanJoin(withNull, bench).collect()
    assert(an.length === 6 && bn.length === 6,
      s"null-text doc dropped: scan ${an.length}, scanJoin ${bn.length}")
    assert(an.map(_.toSeq).toSeq === bn.map(_.toSeq).toSeq)
    val nullRow = an.find(_.getLong(0) == 999999L).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3))
  }

  test("contamination scan orders by doc_id even from a scrambled corpus") {
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0).repartition(7)
    val out = graft.operators.Contamination.scan(corpus, bench)
    // the optimized plan must CARRY the presentation sort: the pre-r14
    // form parked it under the broadcast join, where EliminateSorts
    // silently dropped it (the r13 advisor finding) — a scrambled input
    // then surfaced in scramble order
    val sorts = out.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
    }
    assert(sorts.nonEmpty, out.queryExecution.optimizedPlan.toString)
    val ids = out.collect().map(_.getLong(0)).toSeq
    assert(ids === ids.sorted, "scan output not doc_id-ordered")
  }

  test("contamination shapes stay row-identical with ANSI off (null-text guard)") {
    // with spark.sql.ansi.enabled=false, an unguarded size(null) reads -1:
    // the scan shape would score a null-text document -1/-1 = 1.0
    // (contaminated) while scanJoin's isNotNull guard says null — the
    // explicit when(grams.isNotNull, …) guards keep the shapes identical
    // in both ANSI modes
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0).limit(5)
      .unionByName(spark.sql(
        "SELECT CAST(999999 AS BIGINT) AS doc_id, CAST(NULL AS STRING) AS text, " +
          "'srcx' AS source, CAST(0 AS BIGINT) AS n_chars, 'en' AS lang")
        .select(docs.columns.map(col): _*))
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val a = graft.operators.Contamination.scan(corpus, bench).collect()
      val b = graft.operators.Contamination.scanJoin(corpus, bench).collect()
      assert(a.length === 6 && b.length === 6)
      assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
      val nullRow = a.find(_.getLong(0) == 999999L).get
      assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3)
        && nullRow.isNullAt(4), nullRow.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("contamination: decontaminate auto-switches shape on benchmark gram count") {
    import graft.operators.Contamination
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // small benchmark (default cutover): broadcast-array scan — the plan
    // carries the single-row nested-loop broadcast, no per-gram explode join
    val small = Contamination.decontaminate(corpus, bench)
    assert(shape(small).contains("BroadcastNestedLoopJoin"))
    // same benchmark declared oversized (cutover 1 gram): the hash-join
    // shape — per-gram broadcast hash join, no nested-loop
    val big = Contamination.decontaminate(corpus, bench, maxBroadcastGrams = 1L)
    assert(!shape(big).contains("BroadcastNestedLoopJoin"))
    assert(shape(big).contains("BroadcastHashJoin"))
    // and the switch is purely physical: row-identical output
    assert(small.collect().map(_.toSeq).toSeq === big.collect().map(_.toSeq).toSeq)
  }

  test("frame dedup finds frames shared across documents, skips within-doc repeats") {
    // docs 1/2 share their first 16 bytes (one shared frame at offset 0);
    // doc 3 repeats ITS OWN first frame at offset 64 (within-doc repeat —
    // must not count: n_docs < 2); doc 4 is unique
    val pad = "x" * 48
    val media = Multimodal.binaryColumns(Seq(
      (1L, "SHARED-INTRO-16B" + pad + "tail one", "s"),
      (2L, "SHARED-INTRO-16B" + pad + "tail two", "s"),
      (3L, "SELF-REPEAT-0123" + pad + "SELF-REPEAT-0123" + pad, "s"),
      (4L, "totally unique content here", "s"))
      .toDF("doc_id", "text", "source"))
    val out = Multimodal.frameDedup(media).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_docs") === 2L)
    assert(out.head.getAs[Long]("n_occurrences") === 2L)
    assert(out.head.getAs[Long]("first_doc") === 1L)
    // and the real corpus has cross-doc frame repeats (oracle-checked too)
    assert(Multimodal.frameDedup(
      Multimodal.binaryColumns(docs)).count() > 0)
  }

  test("repetition signals flag boilerplate, pass varied text") {
    val planted = Seq(
      (1L, "buy now buy now buy now buy now buy now", "s"),   // pure loop
      (2L, "the quick brown fox jumps over a lazy dog", "s"), // all distinct
      (3L, "spam spam spam eggs and ham", "s"))               // token-heavy
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.repetitionSignals(planted).collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Boolean]("repetitive"))
    assert(out(0).getAs[Double]("top_2gram_fraction") > 0.4)
    assert(!out(1).getAs[Boolean]("repetitive"))
    assert(out(1).getAs[Long]("top_token_count") === 1L)
    assert(out(2).getAs[Boolean]("repetitive")) // 3/6 tokens are "spam"
    assert(out(2).getAs[Double]("top_token_fraction") === 0.5)
    // fractions are well-formed on the real corpus
    val real = TextAnalysis.repetitionSignals(docs)
    assert(real.filter(col("top_token_fraction") > 1
      || col("top_2gram_fraction") > 1).count() === 0)
  }

  test("boilerplate mining finds the shared template, one vote per doc") {
    val tpl = "subscribe to our newsletter today"
    val planted = (1L to 6L).map(i => (i, s"$tpl tail$i mid$i end$i", "s")) :+
      ((7L, s"$tpl $tpl $tpl", "s")) :+ // within-doc repeats still ONE vote
      ((8L, "no template text in this one at all", "s"))
    val out = TextAnalysis.boilerplate(
      planted.toDF("doc_id", "text", "source"), n = 3, minDocs = 5).collect()
    assert(out.nonEmpty)
    val byGram = out.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    // the full-template 3-grams appear in docs 1-7 → 7 votes (doc 7's
    // triple repetition counts once)
    assert(byGram("subscribe to our") === 7L)
    assert(byGram("to our newsletter") === 7L)
    assert(!byGram.keys.exists(_.contains("tail")), byGram.keys.mkString(","))
    assert(out.head.getAs[Long]("first_doc") === 1L)
  }

  test("corpus stats: shares sum to 1 and totals reconcile with token stats") {
    val stats = TextAnalysis.corpusStats(docs).collect()
    val shareSum = stats.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    val nDocs = stats.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === docs.count())
    val tokTotal = stats.map(_.getAs[Long]("total_tokens")).sum
    val tokExpected = TextAnalysis.tokenStats(docs)
      .agg(sum(col("n_tokens"))).collect().head.getLong(0)
    assert(tokTotal === tokExpected)
  }

  test("curate agrees with its component operators on every document") {
    val cur = TextAnalysis.curate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val q = TextAnalysis.qualityScore(docs).collect()
    assert(q.nonEmpty && cur.size === q.length)
    q.foreach { r =>
      val c = cur(r.getLong(0))
      assert(c.getAs[Double]("score") === r.getAs[Double]("score"))
      assert(c.getAs[String]("quality_band") === r.getAs[String]("quality_band"))
    }
    TextAnalysis.repetitionSignals(docs).collect().foreach { r =>
      assert(cur(r.getLong(0)).getAs[Boolean]("repetitive")
        === r.getAs[Boolean]("repetitive"))
    }
    TextAnalysis.piiScan(docs).collect().foreach { r =>
      assert(cur(r.getLong(0)).getAs[Long]("n_pii") === r.getAs[Long]("n_pii"))
    }
    cur.values.foreach { c =>
      assert(c.getAs[Boolean]("keep") ===
        (c.getAs[Double]("score") >= 0.6 && !c.getAs[Boolean]("repetitive")))
    }
  }

  test("deterministic sampling: reproducible, stratified, rate-accurate") {
    import graft.operators.Sampling
    val rates = Map("src0" -> 100, "src1" -> 0)
    val s1 = Sampling.stratifiedSample(docs, rates).collect()
    val s2 = Sampling.stratifiedSample(docs, rates).collect()
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq) // bit-reproducible
    val bySource = s1.groupBy(_.getAs[String]("source"))
    assert(!bySource.contains("src1"))                       // rate-0 stratum dropped
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(bySource("src0").length.toLong === src0Total)     // rate-100 keeps all
    // default-rate strata land near 10% (LCG uniformity; loose bounds at
    // this corpus size)
    val rest = s1.count(r => r.getAs[String]("source") != "src0")
    val restTotal = docs.filter(col("source") =!= "src0" && col("source") =!= "src1").count()
    val frac = rest.toDouble / restTotal
    assert(frac > 0.02 && frac < 0.25, s"default-rate fraction $frac")
    // membership is a pure function of doc_id: uniform sample at 100% is everything
    assert(Sampling.uniformSample(docs, "doc_id", 100).count() === docs.count())
    assert(Sampling.uniformSample(docs, "doc_id", 0).count() === 0)
    intercept[IllegalArgumentException] {
      Sampling.uniformSample(docs, "doc_id", 101)
    }
  }

  test("sequence packing: prefix-exact, budget-aligned, partitioning-independent") {
    val docs = Tables.documents(spark, sf)
    val budget = 128L
    val packed = graft.operators.Packing
      .packSequences(docs, budget = budget, shards = 4).cache()
    // per-shard prefix property: start_tok is the exact running sum of
    // the preceding docs' token counts in doc_id order
    val byShard = packed.collect().groupBy(_.getAs[Int]("shard"))
    assert(byShard.size === 4)
    for ((_, rows) <- byShard) {
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("start_tok") === cum,
          s"doc ${r.getAs[Long]("doc_id")}: start ${r.getAs[Long]("start_tok")} != prefix $cum")
        cum += r.getAs[Long]("n_tokens")
      }
    }
    // sequence arithmetic: the doc occupies exactly
    // [seq_id, seq_id + n_seqs - 1] under the budget chunking
    packed.collect().foreach { r =>
      val (start, n) = (r.getAs[Long]("start_tok"), r.getAs[Long]("n_tokens"))
      val (seq, off, spans) = (r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_offset"), r.getAs[Long]("n_seqs"))
      assert(seq === start / budget)
      assert(off === start % budget)
      assert(spans === (start + n - 1) / budget - seq + 1)
      assert(spans >= 1)
    }
    // straddling docs exist at this budget (otherwise the n_seqs>1
    // contract is untested) and every token position is accounted for
    assert(packed.filter(col("n_seqs") > 1).count() > 0)
    // partitioning must not change the assignment
    val shuffled = graft.operators.Packing
      .packSequences(docs.repartition(13), budget = budget, shards = 4)
    assert(shuffled.collect().map(_.toString).sorted
      .sameElements(packed.collect().map(_.toString).sorted))
  }

  test("chunking: full coverage, exact overlap, substring-exact chunks") {
    val docs = Tables.documents(spark, sf)
    val (budget, overlap) = (64, 16)
    val step = budget - overlap
    val chunks = graft.operators.Packing
      .chunkDocuments(docs, budget, overlap).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet === texts.keySet, "every document must chunk")
    for ((id, rows) <- chunks) {
      val toks = texts(id).split(" ", -1)
      val sorted = rows.sortBy(_.getAs[Long]("chunk_no"))
      // chunk count is the integer ceiling form
      val want = math.max((math.max(toks.length - overlap, 1) + step - 1) / step, 1)
      assert(sorted.length === want, s"doc $id: ${sorted.length} chunks != $want")
      sorted.zipWithIndex.foreach { case (r, k) =>
        assert(r.getAs[Long]("chunk_no") === k.toLong)
        val expect = toks.slice(k * step, k * step + budget)
        // substring-exact: single-space re-join over the single-space
        // token contract reproduces the source text span
        assert(r.getAs[String]("chunk_text") === expect.mkString(" "))
        assert(r.getAs[Long]("n_tokens") === expect.length.toLong)
      }
      // coverage: the last chunk reaches the document's end
      assert((sorted.length - 1) * step + budget >= toks.length,
        s"doc $id: tail tokens uncovered")
      // multi-chunk docs share exactly `overlap` tokens between
      // consecutive chunks (except a shorter tail)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val at = a.getAs[String]("chunk_text").split(" ", -1)
          val bt = b.getAs[String]("chunk_text").split(" ", -1)
          assert(at.takeRight(at.length - step).sameElements(
            bt.take(at.length - step)))
        case _ =>
      }
    }
    // this corpus genuinely multi-chunks at the registered dials
    assert(chunks.values.exists(_.length > 1), "no doc multi-chunked")
    // short doc: one chunk, itself
    import spark.implicits._
    val one = graft.operators.Packing.chunkDocuments(
      Seq((1L, "tiny doc", "s")).toDF("doc_id", "text", "source"),
      budget, overlap).collect()
    assert(one.length === 1 && one.head.getAs[String]("chunk_text") === "tiny doc")
  }
}
