package graft

import org.apache.spark.sql.SparkSession

/** Standalone runner for the [[RecallProbe]] telemetry — the scaling
  * study's recall evidence without paying for a full bench pass:
  * `runMain graft.RecallRun <sfDir>` prints one line with every
  * operating point (default / wide / budget / auto, planted recalls,
  * and the interleaved-minimum cost ratios). */
object RecallRun {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallRun <sfDir>")
    val spark = SparkSession.builder()
      .appName("graft-recall-run").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = RecallProbe.run(spark, args(0)).toSeq.sortBy(_._1)
      println("RECALL " + args(0) + " " +
        r.map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    } finally spark.stop()
  }
}
