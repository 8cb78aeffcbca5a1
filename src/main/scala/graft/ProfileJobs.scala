package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level wall-clock profiler for any registered query key: runs the
  * key end-to-end (same noop-sink evaluation as Bench) with a listener
  * recording every Spark job's duration, so a key's cost decomposes into
  * its SERIAL ACTIONS — eager checkpoints, sizing aggregates, guard
  * counts, the main noop job — instead of one opaque total. The gap
  * between the sum of job times and the wall time is driver-side work
  * (planning, codegen, model fits, broadcast builds).
  *
  * Usage: runMain graft.ProfileJobs <sfDir> <key>[,key...] [reps]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileJobs <sfDir> <key>[,key...] [reps]")
    val sfDir = args(0)
    val keys = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        done.add((je.jobId, (je.time - t0) / 1e3, desc))
      }
    })
    // warm-up (JIT/codegen), as Bench does
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      (1 to reps).foreach { r =>
        done.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        val js = done.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
        val jobSum = js.map(_._2).sum
        println(f"[profile] $key rep $r wall=$wall%.3f s jobs=${js.length} " +
          f"jobSum=$jobSum%.3f s driverGap=${wall - jobSum}%.3f s")
        js.foreach { case (id, secs, desc) =>
          println(f"[profile]   job $id%3d $secs%7.3f s  $desc")
        }
      }
    }
    spark.stop()
  }
}
