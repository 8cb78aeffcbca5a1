package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: word n-grams of a text column in ONE pass —
  * `word_ngrams(text, n, distinct)` ≡
  * `transform(sequence(0, greatest(size(split(text,' '))-n, 0)),
  *            i -> concat_ws(' ', slice(split(text,' '), i+1, n)))`
  * (+ `array_distinct` when `distinct`), the gram construction of
  * tx_boilerplate / tx_ngram_freq / dd_contamination.
  *
  * The built-in chain runs as INTERPRETED higher-order functions —
  * per-element lambda frames, a fresh sliced array and a concat buffer
  * per gram, the token array re-evaluated per HOF — and at sf0.1 the
  * pandas twin beat it ~10× on the gram-heavy keys. This kernel is one
  * scan of the string (token boundaries found once, grams sliced out of
  * the original bytes, dedup via a hash set on the fly) and stays inside
  * whole-stage codegen via a static call.
  *
  * Exact-equivalence contract with the expression form (property-specced
  * in KernelPropertySpec, and the DuckDB oracles of the three keys stay
  * bit-exact): split on every single space (consecutive spaces yield
  * empty tokens, a trailing space a trailing empty token — Java regex
  * `split(" ", -1)` semantics); windows start at 0..max(len-n, 0), so a
  * short document yields ONE short gram; grams join tokens with a single
  * space; `distinct` keeps first occurrences in order. Null text → null.
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  // plan-time guard: n = 0 would make `last` negative in compute and
  // throw ArrayIndexOutOfBoundsException mid-task — misuse through the
  // registered word_ngrams SQL function must fail at analysis instead
  require(n >= 1, s"word_ngrams requires n >= 1 (got $n)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.WordNGrams.compute(
         |  $s, $n, $distinct);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** Native codegen expression: per-term occurrence counts of a string
  * array in ONE pass — `token_term_counts(toks)` ≡
  * `transform(array_distinct(toks), t ->
  *    struct(t AS term, CAST(size(filter(toks, x -> x = t)) AS LONG) AS tf))`,
  * the in-row term-frequency step of tx_tfidf (salientTerms).
  *
  * The expression form scans the token array once PER DISTINCT TERM —
  * O(n·d) per document, quadratic on natural text where d ≈ n — as
  * interpreted HOF lambdas. This kernel is one hash-map pass: O(n) with
  * terms emitted in first-appearance order (array_distinct's order), so
  * the exploded (term, tf) row set is identical (property-specced in
  * KernelPropertySpec). Null array → null; null elements are counted
  * under a shared null key by the expression form's null-safe equality,
  * but tokenized text (split output) never contains nulls, so the kernel
  * requires none (containsNull inputs still work — null tokens group
  * together, matching `x <=> t` grouping). */
case class TokenTermCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType), StructField("tf", LongType))),
    containsNull = false)

  override def prettyName: String = "token_term_counts"

  override protected def nullSafeEval(input: Any): Any =
    WordNGrams.termCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WordNGrams.termCounts($a);")

  override protected def withNewChildInternal(newChild: Expression): TokenTermCounts =
    copy(child = newChild)
}

object WordNGrams {

  /** One-pass gram construction (see class doc for the exact contract).
    * Static so generated code calls it directly without boxing. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val s = text.toString
    // token boundaries: starts(i) .. ends(i) index into `s`; split on
    // every single space, keeping empty tokens (split(" ", -1) semantics)
    var tokens = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') tokens += 1; i += 1 }
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = s.length
    // windows 0..max(tokens-n, 0); gram = s[starts(w) .. ends(min(w+n,tokens)-1)]
    // — the tokens joined by their own single-space separators, which is
    // exactly concat_ws(" ", slice(...)) over space-split tokens
    val windows = math.max(tokens - n, 0) + 1
    val out = new java.util.ArrayList[UTF8String](windows)
    val seen = if (distinct) new java.util.HashSet[UTF8String](windows * 2) else null
    var w = 0
    while (w < windows) {
      val last = math.min(w + n, tokens) - 1
      val gram = UTF8String.fromString(s.substring(starts(w), ends(last)))
      if (!distinct || seen.add(gram)) out.add(gram)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One hash-map pass for [[TokenTermCounts]] (see its doc for the
    * exact contract). Static so generated code calls it directly. */
  def termCounts(toks: org.apache.spark.sql.catalyst.util.ArrayData)
      : GenericArrayData = {
    val n = toks.numElements()
    // LinkedHashMap preserves first-appearance order = array_distinct's
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      // null tokens (never produced by split, legal in a raw array)
      // group under one key, matching the expression form's x <=> t
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val c = counts.get(t)
      if (c == null) counts.put(t, Array(1L)) else c(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }
}
