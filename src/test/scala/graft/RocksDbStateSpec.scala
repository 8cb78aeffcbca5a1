package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StatefulDrift, StreamingAlerts}

/** Production state-store realism for the stateful streaming surface: the
  * flatMapGroupsWithState drift detector runs on the RocksDB state store
  * provider (the configuration a real deployment uses once state outgrows
  * the default in-memory/HDFS provider's executor heap — RocksDB keeps
  * state off-heap and on local disk with incremental checkpoints) and
  * must produce byte-for-byte the same alerts as the default provider.
  * SURVEY §5 documents the config. */
class RocksDbStateSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def driftReplay(queryName: String): Set[Long] = {
    val stream = StatefulDrift.detect(
      StreamingAlerts.readEvents(spark, sf)
        .withColumn("ts_us", unix_micros(col("event_time"))))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    // ProcessingTimeTimeout state-GC keeps the query alive after the data
    // is drained (it would sit waiting for the 1-hour timeout): poll the
    // sink to stability, then stop explicitly (TestSpark.drainAndStop)
    TestSpark.drainAndStop(q, queryName)
    spark.table(queryName).select("event_id").collect().map(_.getLong(0)).toSet
  }

  test("drift detector on the RocksDB state store matches the default provider") {
    val prev = spark.conf.getOption(ProviderConf)
    val default = driftReplay("drift_default_store")
    spark.conf.set(ProviderConf, RocksDb)
    try {
      val rocks = driftReplay("drift_rocksdb_store")
      assert(rocks.nonEmpty)
      assert(rocks === default)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderConf, v)
        case None => spark.conf.unset(ProviderConf)
      }
    }
  }
}
