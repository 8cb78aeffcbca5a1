package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: the quality gate's three text counts in
  * ONE pass — `quality_counts(text)` returns
  * `struct(n_tokens, alpha, n_stop)` ≡ the TextAnalysis.withQuality
  * expression chain
  *
  *   n_tokens = size(split(text, " "))            (the engine token
  *              counter, TextAnalysis.tokenCount — one convention
  *              everywhere)
  *   alpha    = length(regexp_replace(text, "[^a-zA-Z]", ""))
  *   n_stop   = size(filter(split(text, " "), t -> t IN stopwords))
  *
  * The chain pays one regex traversal (with a fresh copied string), two
  * array materializations of every token, and an interpreted
  * higher-order filter with a 6-way isin per token. This kernel is one
  * byte scan: token boundaries at the single-space byte, alpha as a
  * byte-range count, stop tokens by byte-compare against the fixed
  * ASCII stopword list.
  *
  * Byte-level exactness for all UTF-8 input: ' ' (0x20) and [A-Za-z]
  * are ASCII values that never occur inside a multi-byte UTF-8
  * sequence, so counting ' ' bytes IS the split-token count, counting
  * [A-Za-z] bytes IS the post-regex code-point length (the regex
  * deletes non-alpha CODE POINTS; what remains is one ASCII char per
  * alpha byte), and byte-equality against an ASCII stopword IS string
  * equality. Property-specced against the chain (KernelPropertySpec)
  * on the corpus, random ASCII and multi-byte strings. Null → null. */
case class QualityCounts(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(stopwords.nonEmpty && stopwords.forall(w => w.nonEmpty &&
    w.forall(c => c < 128 && c != ' ')),
    "quality_counts stopwords must be non-empty ASCII words without spaces")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  override def prettyName: String = "quality_counts"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override protected def nullSafeEval(input: Any): Any =
    QualityCounts.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopRef = ctx.addReferenceObj("stopBytes", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.QualityCounts.compute($s, $stopRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityCounts =
    copy(child = newChild)
}

object QualityCounts {

  /** One-pass (n_tokens, alpha, n_stop) — see class doc. Static so
    * generated code calls it directly. */
  def compute(text: UTF8String, stop: Array[Array[Byte]]): InternalRow = {
    val bytes = text.getBytes
    var nTokens = 1L
    var alpha = 0L
    var nStop = 0L
    var tokStart = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i < bytes.length) nTokens += 1
        val len = i - tokStart
        var s = 0
        var found = false
        while (!found && s < stop.length) {
          val w = stop(s)
          if (w.length == len) {
            var j = 0
            while (j < len && w(j) == bytes(tokStart + j)) j += 1
            found = j == len
          }
          s += 1
        }
        if (found) nStop += 1
        tokStart = i + 1
      } else {
        val b = bytes(i)
        if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) alpha += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTokens, alpha, nStop))
  }
}
