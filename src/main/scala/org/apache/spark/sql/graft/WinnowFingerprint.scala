package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: the full winnowing fingerprint of a text
  * column in ONE pass — `winnow_fingerprint(text, k, window)` ≡ the
  * TextAnalysis.fingerprintSets expression chain
  * (reference for the hash constants: engine-neutral modular polynomial
  * arithmetic, SURVEY §4):
  *
  *   tok_hashes[t]   = fold over the token's chars:
  *                     acc := (acc·131 + char) mod 1000003, from 0
  *   shingle[i]      = fold over tok_hashes[i, i+k):
  *                     acc := (acc·8191 + h) mod 1000003, from 0
  *                     for i in 0..max(nTok − k, 0)   (short doc → one
  *                     shingle over the whole short array)
  *   fingerprint     = sort(distinct(min(shingle[i, i+window)) for i in
  *                     0..max(nSh − window, 0)))
  *
  * The expression form runs as interpreted higher-order functions —
  * per-CHARACTER lambda frames (split(t, "") materializes one
  * single-char string per character, ascii() a boxed long per char) —
  * and the real evaluated cost at sf0.1 measured 28.5 s for 5k
  * documents once the bench stopped letting count() prune it. This
  * kernel is one tight loop over the string: token boundaries found
  * once (split-on-single-space, keep-empties — WordNGrams' contract),
  * char folds on primitive longs, shingle folds over the token-hash
  * array, window minima by scan. Exact equivalence with the expression
  * chain is property-specced (KernelPropertySpec) over the test corpus
  * and random ASCII strings; the committed DuckDB oracle stays
  * bit-exact. Null text → null.
  *
  * Character semantics: Unicode CODE POINTS (matching split(t, "") +
  * ascii() for every BMP/ASCII corpus — Java's empty-regex split
  * yields code points, and ascii() of a one-code-point string is that
  * code point's value for ASCII; the synthetic corpora and oracles are
  * ASCII by construction). */
case class WinnowFingerprint(child: Expression, k: Int, window: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"winnow_fingerprint requires k >= 1 (got $k)")
  require(window >= 1, s"winnow_fingerprint requires window >= 1 (got $window)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowFingerprint.compute($s, $k, $window);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {

  private val Mod = 1000003L

  /** One-pass winnowing fingerprint (see class doc for the contract).
    * Static so generated code calls it directly without boxing. */
  def compute(text: UTF8String, k: Int, window: Int): GenericArrayData = {
    val s = text.toString
    // token char-hashes in one scan: fold chars until the next single
    // space; an empty token folds nothing and hashes to 0 — exactly the
    // expression form's ascii('') = 0 single step
    var nTok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') nTok += 1; i += 1 }
    val tokHash = new Array[Long](nTok)
    var t = 0
    var acc = 0L
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') { tokHash(t) = acc; t += 1; acc = 0L; i += 1 }
      else {
        val cp = s.codePointAt(i)
        acc = (acc * 131L + cp) % Mod
        i += Character.charCount(cp)
      }
    }
    tokHash(t) = acc
    // shingle hashes: windows of k token-hashes, truncated only in the
    // single short-doc case (nTok < k → one shingle over everything)
    val nSh = math.max(nTok - k, 0) + 1
    val shingle = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      var h = 0L
      var j = i
      val end = math.min(i + k, nTok)
      while (j < end) { h = (h * 8191L + tokHash(j)) % Mod; j += 1 }
      shingle(i) = h
      i += 1
    }
    // window minima, then sorted-distinct
    val nWin = math.max(nSh - window, 0) + 1
    val mins = new Array[Long](nWin)
    i = 0
    while (i < nWin) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + window, nSh)
      while (j < end) { if (shingle(j) < m) m = shingle(j); j += 1 }
      mins(i) = m
      i += 1
    }
    java.util.Arrays.sort(mins)
    var n = 0
    i = 0
    while (i < nWin) {
      if (n == 0 || mins(i) != mins(n - 1)) { mins(n) = mins(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, n))
  }
}
