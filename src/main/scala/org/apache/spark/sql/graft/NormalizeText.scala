package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: full text canonicalization in ONE pass —
  * `normalize_text(text)` ≡ the TextAnalysis.normalize expression chain
  *
  *   trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
  *        " +", " "))
  *
  * i.e. lowercase, non-alphanumerics to spaces, whitespace collapsed,
  * trimmed (the canonicalization pass an LLM-data pipeline runs before
  * dedup/quality/tokenization; reference behavior: the cleaning rules of
  * src/etl.py's string canonicalization, re-expressed Spark-first).
  *
  * The expression form pays two full regex traversals (each with its
  * per-char NFA step and a fresh output copy) plus the lower pass — the
  * round-12 honest harness billed tx_normalize at 4.7 s sf1, all of it
  * per-row compute. This kernel is the same function as one automaton:
  * one UTF8String lowercase (the identical routine the Lower expression
  * calls, ASCII fast path included), then a single byte scan that keeps
  * [a-z0-9], turns every other RUN of bytes into one pending space, and
  * materializes the space only when a kept byte follows — which IS
  * punct→space + collapse + trim fused (a run of N non-kept code points
  * becomes N spaces in the chain, collapsed to one, and leading/trailing
  * pending spaces are never emitted).
  *
  * Byte-level correctness for all UTF-8 input: kept bytes are ASCII, and
  * ASCII byte values never occur inside a multi-byte UTF-8 sequence, so
  * scanning BYTES (not code points) classifies exactly — a multi-byte
  * code point contributes only non-kept bytes, and whether it maps to
  * one space or three is erased by the collapse. Exact equivalence with
  * the expression chain is property-specced (KernelPropertySpec) over
  * the test corpus, random ASCII and non-ASCII strings; the committed
  * DuckDB oracle stays bit-exact. Null text → null. Output is pure
  * ASCII `[a-z0-9 ]` with single interior spaces and no edge spaces. */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.NormalizeText.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** One-pass canonicalization (see class doc for the contract). Static
    * so generated code calls it directly without boxing. */
  def compute(text: UTF8String): UTF8String = {
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var pending = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pending) { out(n) = ' '; n += 1; pending = false }
        out(n) = b
        n += 1
      } else if (n > 0) {
        pending = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }
}
