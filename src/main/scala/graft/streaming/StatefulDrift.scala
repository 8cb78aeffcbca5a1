package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming drift detection — the real-time twin of the batch
  * gaps-and-islands rule (AnomalyRules.consecutiveRuns; reference:
  * src/models.py:68 `_detect_temp_drift`, "over threshold for N+
  * consecutive readings"), expressed with
  * `flatMapGroupsWithState`: per-key state is just the current run length,
  * and an alert is emitted for every reading once the run reaches
  * `minRun`.
  *
  * Scale: state is one counter per key (bounded), grouped on `user_id`, so
  * the state store partitions with the key space; timeouts clear counters
  * for keys that go silent.
  */
object StatefulDrift {

  final case class Reading(event_id: Long, user_id: Long, ts_us: Long, value: Double)
  final case class RunState(runLen: Int)
  final case class DriftAlert(event_id: Long, user_id: Long, ts_us: Long,
      value: Double, run_len: Int)

  /** Per-group transition: extend or reset the run; emit readings whose
    * run length has reached `minRun`. Batches arrive in arbitrary order,
    * so readings are sorted by event time within the batch. */
  def transition(threshold: Double, minRun: Int)(
      key: Long, rows: Iterator[Reading], state: GroupState[RunState]): Iterator[DriftAlert] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var run = state.getOption.map(_.runLen).getOrElse(0)
      val out = scala.collection.mutable.ArrayBuffer.empty[DriftAlert]
      rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).foreach { r =>
        run = if (r.value > threshold) run + 1 else 0
        if (run >= minRun) {
          out += DriftAlert(r.event_id, r.user_id, r.ts_us, r.value, run)
        }
      }
      state.update(RunState(run))
      state.setTimeoutDuration("1 hour")
      out.iterator
    }
  }

  /** Wire the detector over a streaming (or batch, for testing) events
    * frame carrying event_id/user_id/ts_us/value. */
  def detect(events: DataFrame, threshold: Double = 100.0,
      minRun: Int = 3): Dataset[DriftAlert] = {
    implicit val encR = Encoders.product[Reading]
    implicit val encS = Encoders.product[RunState]
    implicit val encA = Encoders.product[DriftAlert]
    implicit val encK = Encoders.scalaLong
    events
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      .as[Reading]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        transition(threshold, minRun))
  }
}
