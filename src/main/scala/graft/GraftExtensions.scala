package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{FloatDotProduct, LongArrayMatchCount, SimHashBits, SortedStringArrayIntersectCount}

/** Session extension installing the native kernels as SQL functions, so
  * `spark.sql("SELECT float_dot(a, b) ...")` works for SQL-first users —
  * the SparkSessionExtensions registration path from the preference-order
  * guide (inject functions rather than shipping UDF jars).
  *
  * Use either at build time:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * or via config:
  *   spark.sql.extensions=graft.GraftExtensions
  * or on a live session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}

object GraftExtensions {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> (es => FloatDotProduct(es(0), es(1))),
    "long_array_match_count" -> (es => LongArrayMatchCount(es(0), es(1))),
    "simhash_bits" -> (es => SimHashBits(es(0))),
    "sorted_intersect_count" -> (es => SortedStringArrayIntersectCount(es(0), es(1))))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
