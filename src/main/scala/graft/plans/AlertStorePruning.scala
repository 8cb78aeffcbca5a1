package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: derive `epoch_day` partition predicates from `ts_us`
  * range filters over the alert-store layout.
  *
  * The alert lake (graft.operators.AlertStore) is day-partitioned with the
  * invariant `epoch_day = ts_us div 86 400 000 000` written at append time
  * (reference analog: db.py's indexed timestamp scans). Dashboards filter
  * by raw time range (dashboard_app.py:73) — without this rule such a
  * query scans every day partition and filters rows; with it, the implied
  * `epoch_day` bounds are conjoined and Spark's partition pruning drops
  * the out-of-range days at planning time, so a one-week query over years
  * of alerts touches seven directories.
  *
  * Contract and safety: fires ONLY on a Filter sitting directly on a leaf
  * relation (a scan — never on join/projection outputs where the two
  * columns could come from unrelated frames) that exposes both `ts_us`
  * and an integer-typed `epoch_day` (the store layout; a string-typed
  * epoch_day from disabled partition-type inference is refused), only for
  * conjunct-level `ts_us` comparisons against non-negative literals
  * (where truncating and flooring division agree), and only when the
  * filter does not already constrain `epoch_day`. The derived bounds are
  * logical consequences of the layout invariant — rows never change, only
  * partitions read.
  *
  * Registered via GraftExtensions (injectOptimizerRule) or per-session
  * through `spark.experimental.extraOptimizations`.
  *
  * GLOBAL-REGISTRATION HAZARD (narrowed): the match additionally requires
  * `epoch_day` to be a PARTITION column of a file-based (v1) relation —
  * not merely present in the output. Deriving `epoch_day` predicates is
  * only ever useful when the column prunes directories, so restricting to
  * partition columns loses nothing and shrinks the false-positive surface
  * to tables that are day-partitioned by an integer `epoch_day` AND carry
  * a long `ts_us` — the alert-store layout contract. A foreign table
  * matching even that must still uphold `epoch_day = ts_us div
  * 86400000000` at write time; keep the column pair reserved for
  * AlertStore-written data (rename one of them on foreign tables), or
  * register the rule only on sessions that query the alert lake.
  */
object AlertStorePruning extends Rule[LogicalPlan] {

  private val DayUs = 86400000000L

  /** epoch_day must be a partition column of a v1 file relation — the only
    * shape where the derived predicate prunes anything. */
  private def partitionedByEpochDay(child: LogicalPlan): Boolean = child match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.partitionSchema.exists(_.name == "epoch_day")
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child)
        if child.isInstanceOf[LeafNode] && partitionedByEpochDay(child) =>
      val tsAttr = child.output.find(a => a.name == "ts_us" && a.dataType == LongType)
      val dayAttr = child.output.find(a => a.name == "epoch_day"
        && (a.dataType == IntegerType || a.dataType == LongType))
      (tsAttr, dayAttr) match {
        case (Some(ts), Some(day)) if !mentions(cond, day) =>
          val derived = conjuncts(cond).flatMap(deriveBound(_, ts, day))
          if (derived.isEmpty) f
          else Filter(derived.foldLeft(cond)(And(_, _)), child)
        case _ => f
      }
  }

  private def mentions(e: Expression, a: Attribute): Boolean =
    e.references.contains(a)

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** ts_us bound → implied epoch_day bound (non-negative literals only,
    * where `div` truncation equals floor). Strict lower bounds stay
    * conservative: ts > L implies day >= L div D (not day > …). */
  private def deriveBound(e: Expression, ts: Attribute,
      day: Attribute): Option[Expression] = {
    def dayOf(us: Long): Long = us / DayUs
    def cast(v: Long): Expression =
      org.apache.spark.sql.catalyst.expressions.Cast(
        Literal(v), day.dataType)
    e match {
      case GreaterThanOrEqual(t: Attribute, Literal(v: Long, LongType))
          if t.semanticEquals(ts) && v >= 0 =>
        Some(GreaterThanOrEqual(day, cast(dayOf(v))))
      case GreaterThan(t: Attribute, Literal(v: Long, LongType))
          if t.semanticEquals(ts) && v >= 0 =>
        Some(GreaterThanOrEqual(day, cast(dayOf(v))))
      case LessThanOrEqual(t: Attribute, Literal(v: Long, LongType))
          if t.semanticEquals(ts) && v >= 0 =>
        Some(LessThanOrEqual(day, cast(dayOf(v))))
      case LessThan(t: Attribute, Literal(v: Long, LongType))
          if t.semanticEquals(ts) && v > 0 =>
        Some(LessThanOrEqual(day, cast(dayOf(v - 1))))
      case EqualTo(t: Attribute, Literal(v: Long, LongType))
          if t.semanticEquals(ts) && v >= 0 =>
        Some(EqualTo(day, cast(dayOf(v))))
      case _ => None
    }
  }
}
