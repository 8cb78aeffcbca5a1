package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.operators.{IsolationForest, MinHashLsh, Reports}

/** Property tests: native kernels vs plain-Scala reference
  * implementations on randomized data, plus algebraic properties of the
  * pure functions. Kernel cases run as one DataFrame per property (a
  * thousand random rows each), not one Spark job per sample. */
class KernelPropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("winnow_fingerprint kernel equals the expression chain (corpus + random strings)") {
    // the retired expression chain, verbatim, is the kernel's contract
    def compare(df: org.apache.spark.sql.DataFrame, k: Int, window: Int): Long = {
      val toks = split(col("text"), " ")
      val tokenHashes = transform(toks, t =>
        aggregate(transform(split(t, ""), c => ascii(c).cast("long")),
          lit(0L), (acc, c) => pmod(acc * lit(131L) + c, lit(1000003L))))
      val withChain = df
        .withColumn("__th", tokenHashes)
        .withColumn("__sh", transform(
          sequence(lit(0), greatest(size(col("__th")) - k, lit(0))),
          i => aggregate(slice(col("__th"), i + lit(1), lit(k)),
            lit(0L), (acc, h) => pmod(acc * lit(8191L) + h, lit(1000003L)))))
        .withColumn("__fp_expr", array_sort(array_distinct(transform(
          sequence(lit(0), greatest(size(col("__sh")) - window, lit(0))),
          i => array_min(slice(col("__sh"), i + lit(1), lit(window)))))))
        .withColumn("__fp_kernel",
          ColumnBridge.winnowFingerprint(col("text"), k, window))
      withChain.filter(col("__fp_expr") =!= col("__fp_kernel")).count()
    }
    // the real corpus: exactly the key's dials
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    assert(compare(docs, 3, 4) === 0, "kernel diverges on the sf corpus")
    // randomized ASCII: short docs, empty tokens (double/trailing
    // spaces), punctuation, plus other (k, window) dials
    val vocab = (1 to 25).map(i => s"tok$i") ++ Seq("", "a", "x.y", "7")
    val cases = (1 to 400).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }
    val rdf = cases.toDF("doc_id", "text")
    assert(compare(rdf, 3, 4) === 0)
    assert(compare(rdf, 1, 2) === 0)
    assert(compare(rdf, 5, 3) === 0)
  }

  test("normalize_text kernel equals the lower+regexp chain (corpus + random strings)") {
    // the retired expression chain, verbatim, is the kernel's contract
    def compare(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("__chain",
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
        .withColumn("__kernel", ColumnBridge.normalizeText(col("text")))
        .filter(col("__chain") =!= col("__kernel")).count()
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    assert(compare(docs) === 0, "kernel diverges on the sf corpus")
    // randomized: punctuation runs, edge/multi spaces, digits, uppercase,
    // empty strings, and multi-byte code points (accents, CJK, emoji —
    // byte-level classification must still collapse them to single
    // spaces exactly like the per-code-point regex does)
    val pieces = Seq("Tok", "UPPER", "miXed", "7seven", "..!?", "  ", " ",
      "", "a", ".", "über", "naïve", "文档", "emoji🙂end", "Ärger straße")
    val cases = (1 to 600).map { i =>
      val n = rnd.nextInt(10)
      (i.toLong, (0 until n).map(_ => pieces(rnd.nextInt(pieces.length)))
        .mkString(rnd.nextInt(3) match {
          case 0 => "" case 1 => " " case _ => "--" }))
    }
    assert(compare(cases.toDF("doc_id", "text")) === 0,
      "kernel diverges on randomized strings")
    // idempotence carries over: kernel(kernel(x)) = kernel(x)
    val twice = cases.toDF("doc_id", "text")
      .withColumn("__one", ColumnBridge.normalizeText(col("text")))
      .withColumn("__two", ColumnBridge.normalizeText(col("__one")))
      .filter(col("__one") =!= col("__two")).count()
    assert(twice === 0)
  }

  test("quality_counts kernel equals the regexp/filter chain (corpus + random strings)") {
    val stop = Seq("the", "a", "of", "to", "and", "in")
    def compare(df: org.apache.spark.sql.DataFrame): Long = {
      val toks = split(col("text"), " ")
      val qc = ColumnBridge.qualityCounts(col("text"), stop)
      df.withColumn("__nt_c", size(toks).cast("long"))
        .withColumn("__al_c",
          length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long"))
        .withColumn("__st_c",
          size(filter(toks, t => t.isin(stop.map(lit(_)): _*))).cast("long"))
        .withColumn("__k", qc)
        .filter(col("__k.n_tokens") =!= col("__nt_c")
          || col("__k.alpha") =!= col("__al_c")
          || col("__k.n_stop") =!= col("__st_c")).count()
    }
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    assert(compare(docs) === 0, "kernel diverges on the sf corpus")
    // randomized: stopwords, near-stopwords ("thee", "an"), multi-byte
    // code points (alpha/token counts must ignore continuation bytes),
    // empty tokens from doubled spaces, digits and punctuation
    val pieces = Seq("the", "a", "of", "to", "and", "in", "thee", "an",
      "And", "THE", "", "x9", "..", "über", "文", "naïve", "a🙂b", "Straße")
    val cases = (1 to 600).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, (0 until n).map(_ => pieces(rnd.nextInt(pieces.length)))
        .mkString(" "))
    }
    assert(compare(cases.toDF("doc_id", "text")) === 0,
      "kernel diverges on randomized strings")
  }

  test("sorted_intersect_count equals Set intersection on random token sets") {
    val vocab = (1 to 40).map(i => s"w$i")
    val cases = (1 to 1000).map { i =>
      val a = rnd.shuffle(vocab).take(1 + rnd.nextInt(30)).sorted
      val b = rnd.shuffle(vocab).take(1 + rnd.nextInt(30)).sorted
      (i.toLong, a, b, a.toSet.intersect(b.toSet).size)
    }
    val df = cases.toDF("id", "a", "b", "expected")
    val bad = df.filter(
      ColumnBridge.sortedIntersectCount(col("a"), col("b")) =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("sorted_long_intersect_count equals Set intersection, min-multiplicity on multisets") {
    val vals = (1L to 40L).toVector
    val cases = (1 to 1000).map { i =>
      val a = rnd.shuffle(vals).take(1 + rnd.nextInt(30)).sorted
      val b = rnd.shuffle(vals).take(1 + rnd.nextInt(30)).sorted
      (i.toLong, a, b, a.toSet.intersect(b.toSet).size)
    }
    val df = cases.toDF("id", "a", "b", "expected")
    val bad = df.filter(
      ColumnBridge.sortedLongIntersectCount(col("a"), col("b")) =!= col("expected"))
    assert(bad.count() === 0)
    // multiset semantics (a within-doc hash collision duplicates a
    // value): the merge counts min multiplicity per value — so a hashed
    // intersect can only meet or exceed the true token intersection
    val multi = Seq(
      (1L, Seq(5L, 5L, 7L), Seq(5L, 9L), 1),      // min(2,1) = 1
      (2L, Seq(5L, 5L, 7L), Seq(5L, 5L, 7L), 3),  // min(2,2)+min(1,1)
      (3L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), 0))
      .toDF("id", "a", "b", "expected")
    val badM = multi.filter(
      ColumnBridge.sortedLongIntersectCount(col("a"), col("b")) =!= col("expected"))
    assert(badM.count() === 0)
  }

  test("token_term_counts equals the array_distinct/filter expression chain") {
    // natural-text-ish arrays with heavy repetition, plus empty tokens
    // (split artifacts) and the empty array
    val vocab = (1 to 12).map(i => s"w$i") :+ ""
    val cases = (1 to 1000).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.length))))
    } :+ (2000L, Seq.empty[String])
    val df = cases.toDF("id", "toks").cache()
    val expected = transform(array_distinct(col("toks")), t =>
      struct(t.as("term"),
        size(filter(col("toks"), x => x === t)).cast("long").as("tf")))
    val bad = df.filter(
      ColumnBridge.termCounts(col("toks")) =!= expected)
    assert(bad.count() === 0)
    // null array → null, matching the chain's null contract
    val nulls = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS toks")
      .select(ColumnBridge.termCounts(col("toks")).as("c"))
    assert(nulls.head.isNullAt(0))
  }

  test("word_ngrams equals the split/transform/slice/concat_ws expression chain") {
    // adversarial strings: consecutive/leading/trailing spaces (empty
    // tokens), single tokens, empty string, unicode, gram-boundary sizes
    val vocab = Seq("alpha", "beta", "gamma", "δelta", "ε", "x", "", "longish-token")
    val cases = (1 to 1000).map { i =>
      val nTok = rnd.nextInt(8)
      val text = (0 until nTok).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ") + (if (rnd.nextBoolean()) " " else "")
      (i.toLong, text)
    } :+ (2000L, "") :+ (2001L, " ") :+ (2002L, "a  b   c")
    val df = cases.toDF("id", "text").cache()
    for (n <- Seq(1, 2, 3, 5); distinct <- Seq(false, true)) {
      val toks = split(col("text"), " ")
      val expected0 = transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
      val expected = if (distinct) array_distinct(expected0) else expected0
      val bad = df.filter(
        ColumnBridge.wordNGrams(col("text"), n, distinct) =!= expected)
      assert(bad.count() === 0, s"n=$n distinct=$distinct: kernel diverges")
    }
    // null text → null, matching the expression chain's null contract
    val nulls = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(ColumnBridge.wordNGrams(col("text"), 3, distinct = true).as("g"))
    assert(nulls.head.isNullAt(0))
    // n = 0 must fail at plan construction (targeted message), not throw
    // ArrayIndexOutOfBoundsException mid-task
    val guard = intercept[IllegalArgumentException] {
      df.select(ColumnBridge.wordNGrams(col("text"), 0, distinct = false))
    }
    assert(guard.getMessage.contains("n >= 1"))
  }

  test("token-hash kernels match their reference forms (poly mod p / xxhash64)") {
    val vocab = (1 to 50).map(i => s"tok$i") ++
      Seq("", "δelta", "ünïcode", "a b", "𝔘supplementary")
    val cases = (1 to 500).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.length))))
    }
    val df = cases.toDF("id", "toks").cache()
    val p = 2147483647L
    // engine-neutral 31-poly over code points (the MinHash token-hash
    // step) — checked against an independent driver-side fold, including
    // a supplementary-plane character (code point ≠ UTF-16 unit)
    def ref(t: String): Long =
      t.codePoints().toArray.foldLeft(0L)((h, cp) => (h * 31L + cp) % p)
    val got = df.select(col("id"),
        ColumnBridge.tokenHashesMod(col("toks"), p).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.foreach { case (id, toks) =>
      assert(got(id) === toks.map(ref), s"id=$id")
    }
    // engine-neutral 64-bit hash (the SimHash token-hash step): wrapping
    // poly64 + splitmix64 against an independent driver-side fold
    def ref64(t: String): Long =
      org.apache.spark.sql.graft.TokenHashes.mix64(
        t.codePoints().toArray.foldLeft(0L)((h, cp) => h * 31L + cp))
    val got64 = df.select(col("id"),
        ColumnBridge.tokenHashes64(col("toks")).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.foreach { case (id, toks) =>
      assert(got64(id) === toks.map(ref64), s"id=$id")
    }
  }

  test("band_buckets kernel is bit-identical to the seeded-LCG aggregate fold") {
    val k = 128
    val p = 2147483647L
    val cases = (1 to 500).map { i =>
      (i.toLong, Seq.fill(k)(rnd.nextLong().abs % 2147483647L))
    }
    val df = cases.toDF("id", "sig").cache()
    val a = org.apache.spark.sql.graft.TokenHashes.BandMixA
    for (bands <- Seq(8, 16, 32)) {
      val rows = k / bands
      val bad = df.filter(
        ColumnBridge.bandBuckets(col("sig"), bands, rows) =!=
          transform(sequence(lit(0), lit(bands - 1)),
            b => aggregate(slice(col("sig"), b * rows + lit(1), lit(rows)),
              b.cast("long"),
              (acc, v) => pmod(acc * lit(a) + v, lit(p))).cast("int")))
      assert(bad.count() === 0, s"bands=$bands diverges")
    }
  }

  test("quantized decimal dot is bit-identical to the aggregate(zip_with) chain") {
    // adversarial: rounding midpoints at scale 7, -0.0, huge values past
    // DECIMAL(9,7) (cast → null), NaN/±Inf (cast → null), null elements,
    // null arrays, length mismatches (zip_with pads with null → null
    // total), empty arrays (zero), plus mixed-magnitude randoms
    val specials = Seq(0.05e-6f, -0.05e-6f, 1.5e-7f, 0.0f, -0.0f, 123.456f,
      99.9999999f, 100.0f, -100.0f, Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, Float.MinPositiveValue, 1.0e-38f, 3.4e38f,
      0.123456789f, -0.987654321f)
    def arr(): Seq[Option[Float]] = {
      val n = rnd.nextInt(6)
      (0 until n).map { _ =>
        if (rnd.nextInt(20) == 0) None
        else if (rnd.nextInt(3) == 0) Some(specials(rnd.nextInt(specials.length)))
        else Some((rnd.nextFloat() - 0.5f) * 4f)
      }
    }
    val cases = (1 to 2000).map { i =>
      val a = arr()
      // same length most of the time so non-null sums actually happen
      val b = if (rnd.nextInt(4) == 0) arr() else a.map(_ =>
        if (rnd.nextInt(20) == 0) None
        else Some((rnd.nextFloat() - 0.5f) * 4f))
      (i.toLong, if (rnd.nextInt(50) == 0) null else a,
        if (rnd.nextInt(50) == 0) null else b)
    }
    val df = cases.toDF("id", "a", "b")
    val kernel = graft.functions.VectorMath.dotDec(col("a"), col("b"))
    val chain = graft.functions.VectorMath.dotDecExpr(col("a"), col("b"))
    // the kernel implements the TOTAL (non-ANSI) cast semantics — null on
    // NaN/±Inf/past-DECIMAL(9,7) — so the chain must be evaluated under
    // ansi=false for the comparison (under ANSI the chain THROWS on those
    // inputs; production embedding values never reach either branch)
    val ansiBefore = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val bad = df.select(col("id"), kernel.as("k"), chain.as("c"))
        .filter(!(col("k") <=> col("c")))
      assert(bad.count() === 0, bad.collect().take(5).mkString("\n"))
      // non-null sums must actually occur, or the identity is vacuous
      val nonNull = df.select(kernel.as("k")).filter(col("k").isNotNull).count()
      assert(nonNull > 200, s"only $nonNull non-null dots")

      // the long-overflow fallback: values near the DECIMAL(9,7) cap whose
      // products (≈1e18 each) overflow the scale-14 long accumulator within
      // a few elements — the slow path must still match the chain exactly
      val big = (1 to 50).map { i =>
        val n = 3 + rnd.nextInt(30)
        val a = (0 until n).map(_ => Some(90f + rnd.nextFloat() * 9.9f))
        (i.toLong, a, a.map(v => v.map(x => (x * (if (rnd.nextBoolean()) 1 else -1)))))
      }.toDF("id", "a", "b")
      val badBig = big.select(col("id"), kernel.as("k"), chain.as("c"))
        .filter(!(col("k") <=> col("c")))
      assert(badBig.count() === 0, badBig.collect().take(5).mkString("\n"))
      val bigNonNull = big.select(kernel.as("k")).filter(col("k").isNotNull).count()
      assert(bigNonNull === 50, s"overflow-fallback rows must all be non-null")

      // overflow-THEN-null: enough cap-magnitude products to overflow the
      // long accumulator, followed by a null element — the slow path must
      // re-check nulls from the start and return null, never a fabricated
      // sum (the chain nulls on any null element regardless of position)
      val overNull = (1 to 20).map { i =>
        val head: Seq[Option[Float]] = (0 until 15).map(_ => Some(99.9f))
        val a = head :+ (None: Option[Float])
        (i.toLong, a, head :+ Some(1.0f))
      }.toDF("id", "a", "b")
      val kNulls = overNull.select(kernel.as("k"), chain.as("c"))
        .filter(col("k").isNotNull || col("c").isNotNull).count()
      assert(kNulls === 0, "a null element after the overflow point must null both forms")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  test("quantized_cosine14 is bit-identical to the cosineFromDec chain") {
    import graft.functions.VectorMath
    // three regimes of the double conversion: |sum| < 2^53 (pure-double
    // fast path), 2^53 < |sum| < Long.Max (BigDecimal branch), and long
    // overflow (dot14Slow); plus nulls and length mismatches
    def vec(mag: Float, n: Int): Seq[Option[Float]] =
      (0 until n).map(_ => Some((rnd.nextFloat() - 0.5f) * mag))
    val cases = (1 to 1500).map { i =>
      val n = 1 + rnd.nextInt(64)
      val mag = rnd.nextInt(3) match {
        case 0 => 2f    // unit-ish: sums well under 2^53
        case 1 => 60f   // q ~ 3e8: products ~1e17, sums past 2^53
        case _ => 199f  // past the (9,7) cast cap → null elements too
      }
      val a = if (rnd.nextInt(40) == 0) null else vec(mag, n)
      val b = if (rnd.nextInt(40) == 0) null
        else if (rnd.nextInt(5) == 0) vec(mag, 1 + rnd.nextInt(64))
        else vec(mag, n)
      (i.toLong, a, b)
    }
    val df = cases.toDF("id", "a", "b").cache()
    val qa = VectorMath.quantize7(col("a"))
    val qb = VectorMath.quantize7(col("b"))
    val na = VectorMath.normSqDec(col("a"))
    val nb = VectorMath.normSqDec(col("b"))
    val fused = ColumnBridge.quantizedCosine14(qa, qb,
      sqrt(na.cast("double")), sqrt(nb.cast("double")))
    val chain = VectorMath.cosineFromDec(
      VectorMath.quantizedDot(qa, qb), na, nb)
    val bad = df.select(col("id"), fused.as("f"), chain.as("c"))
      .filter(!(col("f") <=> col("c")))
    assert(bad.count() === 0, bad.collect().take(5).mkString("\n"))
    val nonNull = df.select(fused.as("f")).filter(col("f").isNotNull).count()
    assert(nonNull > 300, s"only $nonNull non-null cosines — identity near-vacuous")
  }

  test("long_array_match_count equals element-wise equality count") {
    val cases = (1 to 1000).map { i =>
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)(rnd.nextInt(5).toLong)
      val b = Array.fill(n)(rnd.nextInt(5).toLong)
      (i.toLong, a.toSeq, b.toSeq, a.zip(b).count { case (x, y) => x == y })
    }
    val df = cases.toDF("id", "a", "b", "expected")
    val bad = df.filter(
      ColumnBridge.matchCount(col("a"), col("b")) =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("long_array_match_count_min: exact at/above the floor, below-floor below it") {
    // random signature-ish arrays spanning the three regimes: clear
    // matches (count >= minCount), boundary rows (count == minCount or
    // minCount-1), and background rows (count far below) — the kernel's
    // contract is: result == true count when true count >= minCount, and
    // result < minCount otherwise, so a `>= minCount` filter plus
    // survivor values is indistinguishable from the full kernel
    val k = 128
    for (minCount <- Seq(0, 1, 116, 122, 128, 129)) {
      val cases = (1 to 600).map { i =>
        val matchP = rnd.nextInt(3) match {
          case 0 => 0.6      // background
          case 1 => 0.96     // near-threshold
          case _ => 1.0 - rnd.nextInt(8) / k.toDouble // boundary-exact
        }
        val a = Array.fill(k)(rnd.nextInt(1 << 20).toLong)
        val b = a.zipWithIndex.map { case (v, j) =>
          if (rnd.nextDouble() < matchP) v else v + 1 + rnd.nextInt(5) }
        (i.toLong, a.toSeq, b.toSeq,
          a.zip(b).count { case (x, y) => x == y })
      }
      val got = cases.toDF("id", "a", "b", "true_count")
        .select(col("id"), col("true_count"),
          ColumnBridge.matchCountMin(col("a"), col("b"), minCount).as("m"))
        .collect()
      got.foreach { r =>
        val (id, tc, m) = (r.getLong(0), r.getInt(1), r.getInt(2))
        if (tc >= minCount) assert(m === tc, s"id=$id minCount=$minCount")
        else assert(m < minCount && m <= tc, s"id=$id minCount=$minCount tc=$tc m=$m")
      }
    }
    // mismatched lengths: min-length prefix semantics like the full kernel
    val short = Seq((1L, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 4L, 5L)))
      .toDF("id", "a", "b")
    assert(short.select(ColumnBridge.matchCountMin(col("a"), col("b"), 3))
      .head.getInt(0) === 3)
  }

  test("sorted_long_intersect_count_min: exact at/above need, below-need below it") {
    val vals = (1L to 200L).toVector
    val cases = (1 to 800).map { i =>
      val a = rnd.shuffle(vals).take(1 + rnd.nextInt(60)).sorted
      val b =
        if (rnd.nextInt(3) == 0) a // identical: intersection = |a|
        else rnd.shuffle(vals).take(1 + rnd.nextInt(60)).sorted
      val tc = a.toSet.intersect(b.toSet).size
      // need spans: trivially satisfied (0), boundary (tc, tc+1), high
      val need = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => tc.toLong
        case 2 => tc.toLong + 1L
        case _ => rnd.nextInt(70).toLong
      }
      (i.toLong, a, b, tc, need)
    }
    val got = cases.toDF("id", "a", "b", "true_count", "need")
      .select(col("id"), col("true_count"), col("need"),
        ColumnBridge.sortedLongIntersectCountMin(col("a"), col("b"),
          col("need")).as("m"))
      .collect()
    got.foreach { r =>
      val (id, tc, need, m) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
      if (tc >= need) assert(m === tc, s"id=$id need=$need")
      else assert(m < need && m <= tc, s"id=$id need=$need tc=$tc m=$m")
    }
  }

  test("estMinCount is the exact integer floor of the double threshold filter") {
    // the kernel floor must agree with the `count/k >= θ` IEEE filter for
    // EVERY integer count, at every threshold the operators use (plus
    // adversarial ones near representability boundaries)
    for (k <- Seq(64, 128); t <- Seq(0.5, 0.8, 0.9, 0.95, 0.99, 1.0,
        115.0 / 128.0, 116.0 / 128.0)) {
      val mc = graft.operators.MinHashLsh.estMinCount(k, t)
      (0 to k).foreach { c =>
        assert((c >= mc) === (c.toDouble / k >= t), s"k=$k t=$t c=$c mc=$mc")
      }
    }
  }

  test("embedding_lsh_buckets equals the plain-Scala reference") {
    def refBuckets(vec: Array[Float], tables: Int, planes: Int): Seq[Long] = {
      val iv = vec.map(x => math.floor(x.toDouble * 10000.0).toLong)
      (0 until tables).map { t =>
        (0 until planes).foldLeft(0L) { (acc, p) =>
          val dot = iv.indices.foldLeft(0L) { (s, i) =>
            val x0 = t.toLong * 1000003L + p.toLong * 8191L + i
            val x1 = (x0 * 1103515245L + 12345L) % 2147483648L
            val x2 = (x1 * 1103515245L + 12345L) % 2147483648L
            s + iv(i) * (x2 % 65536L - 32768L)
          }
          acc * 2 + (if (dot >= 0) 1L else 0L)
        }
      }
    }
    val cases = (1 to 300).map { i =>
      val dim = Seq(8, 64, 100)(rnd.nextInt(3))
      val v = Array.fill(dim)((rnd.nextGaussian() * 2).toFloat)
      (i.toLong, v.toSeq, refBuckets(v, 8, 6))
    }
    val df = cases.toDF("id", "vec", "expected")
    val bad = df.filter(
      ColumnBridge.embeddingLshBuckets(col("vec"), 8, 6) =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("nearest_centroid equals the plain-Scala cosine argmax") {
    val dim = 8; val k = 13
    val centroids = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val vecs = (0 until 1000).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))).toSeq
    // reference: same double arithmetic order as the kernel — dot in
    // ascending j, score = dot * (1/||c||), strict > so first-best wins
    val invNorms = centroids.map { c =>
      val s = c.map(x => x.toDouble * x.toDouble).sum
      if (s > 0) 1.0 / math.sqrt(s) else 0.0
    }
    def expected(v: Array[Float]): Int = {
      var best = 0; var bestScore = Double.NegativeInfinity
      for (i <- 0 until k) {
        var dot = 0.0
        for (j <- 0 until dim) dot += v(j).toDouble * centroids(i)(j).toDouble
        val s = dot * invNorms(i)
        if (s > bestScore) { bestScore = s; best = i }
      }
      best
    }
    val got = vecs.toDF("id", "vec")
      .select(col("id"), ColumnBridge.nearestCentroid(col("vec"), centroids).as("cell"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cell")).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === expected(v), s"vector $id")
    }
  }

  test("float_dot equals the Scala fold within 1e-6 relative") {
    val cases = (1 to 500).map { i =>
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)(rnd.nextFloat() - 0.5f)
      val b = Array.fill(n)(rnd.nextFloat() - 0.5f)
      val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      (i.toLong, a.toSeq, b.toSeq, expected)
    }
    val df = cases.toDF("id", "a", "b", "expected")
    val bad = df.filter(
      abs(ColumnBridge.floatDot(col("a"), col("b")) - col("expected")) > 1e-9)
    assert(bad.count() === 0)
  }

  test("minhash estimate is an unbiased-ish Jaccard estimator (|err| small)") {
    // token sets with controlled overlap; k=128 ⇒ s.e. ≈ 0.044
    val vocab = (1 to 60).map(i => s"t$i")
    val docs = (0 until 40).flatMap { g =>
      val shared = vocab.take(30)
      val aExtra = vocab.slice(30, 30 + g % 10)
      Seq((2L * g, (shared ++ aExtra).mkString(" "), "s"),
        (2L * g + 1, shared.mkString(" "), "s"))
    }.toDF("doc_id", "text", "source")
    val sigs = MinHashLsh.signatures(docs)
    val a = sigs.as("a"); val b = sigs.as("b")
    val est = a.join(b, col("a.doc_id") + 1 === col("b.doc_id")
        && col("a.doc_id") % 2 === 0)
      .select(col("a.doc_id").as("id"),
        (ColumnBridge.matchCount(col("a.sig"), col("b.sig")).cast("double") / 128.0)
          .as("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (0 until 40).foreach { g =>
      val jTrue = 30.0 / (30 + g % 10)
      val e = est(2L * g)
      assert(math.abs(e - jTrue) < 0.15, s"group $g est $e true $jTrue")
    }
  }

  test("minhash_signature equals the plain-Scala Carter-Wegman minima") {
    val p = 2147483647L
    val k = 16
    val as = Array.tabulate(k)(i => 1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Array.tabulate(k)(i => rnd.nextInt(Int.MaxValue).toLong)
    def ref(hs: Seq[Long]): Seq[Long] =
      (0 until k).map { i =>
        if (hs.isEmpty) 0L else hs.map(h => (as(i) * h + bs(i)) % p).min
      }
    val cases = (1 to 300).map { i =>
      val hs = Seq.fill(1 + rnd.nextInt(50))(rnd.nextInt(Int.MaxValue).toLong)
      (i.toLong, hs, ref(hs))
    }
    val df = cases.toDF("id", "hs", "expected")
    val bad = df.filter(
      ColumnBridge.minhashSig(col("hs"), as, bs, p) =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("simhash_bits equals the plain-Scala vote counter") {
    def ref(hs: Seq[Long]): Seq[Long] = {
      val votes = new Array[Int](64)
      hs.foreach { h =>
        (0 until 64).foreach { i =>
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        }
      }
      votes.map(v => if (v > 0) 1L else 0L).toSeq
    }
    val cases = (1 to 300).map { i =>
      val hs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong())
      (i.toLong, hs, ref(hs))
    }
    val df = cases.toDF("id", "hs", "expected")
    val bad = df.filter(
      ColumnBridge.simhashBits(col("hs")) =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("forest_score kernel equals the reference tree traversal") {
    val cols = Seq("a", "b", "c")
    val train = (1 to 600).map { i =>
      (i.toLong, rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())
    }.toDF("id", "a", "b", "c")
    val model = IsolationForest.fit(train, cols, trees = 20, subsample = 64,
      sampleSize = 512, seed = 7)
    val cN = IsolationForest.avgPathLength(model.subsample)
    val scored = IsolationForest.score(TestSpark.spark, train, cols, model)
      .select("id", "a", "b", "c", "if_score").collect()
    scored.foreach { r =>
      val xs = Array(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val z = Array.tabulate(3)(i => (xs(i) - model.means(i)) / model.stds(i))
      val want = math.pow(2.0,
        -(model.trees.map(t => IsolationForest.pathLength(z, t, 0)).sum
          / model.trees.length) / cN)
      assert(r.getDouble(4) === want, s"row ${r.getLong(0)}")
    }
  }

  test("isolation forest avgPathLength is monotonic in n") {
    (1 to 500).foreach { _ =>
      val a = 2 + rnd.nextInt(9998)
      val b = a + 1 + rnd.nextInt(1000)
      assert(IsolationForest.avgPathLength(a) <= IsolationForest.avgPathLength(b))
    }
  }

  test("benchmarkBuilding rating bands partition the EUI axis") {
    (1 to 1000).foreach { _ =>
      val area = 1.0 + rnd.nextDouble() * 9999.0
      val energy = rnd.nextDouble() * 1000000.0
      val r = Reports.benchmarkBuilding("X", area, energy)
      val eui = energy / area
      val want = if (eui < 100) "Good" else if (eui > 200) "Poor" else "Average"
      assert(r.performanceRating === want)
      assert(math.abs(r.eui - eui) <= 0.005 + 1e-9)
    }
  }
}
