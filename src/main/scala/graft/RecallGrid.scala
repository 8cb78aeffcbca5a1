package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorMath
import graft.operators.{AnnLsh, Ivf}
import graft.sources.Tables

/** Parameter-grid recall tuner for the two ANN families — the offline
  * companion to RecallProbe: sweeps (tables, planes) for the hyperplane
  * LSH index and nprobe for the IVF index over the same sampled query
  * set and brute-force ground truth, printing one JSON line per
  * operating point with background recall@10, planted recall@10 and the
  * analytic candidate fraction (tables/2^planes, nprobe/cells — the
  * sub-linearity dial). Run once per corpus shape to pick defaults;
  * RecallProbe then pins the chosen point in every bench.
  *
  * Usage: runMain graft.RecallGrid <sfDir>
  */
object RecallGrid {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-recall-grid").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir) finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, nq: Int = 100, k: Int = 10): Unit = {
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint(true)
    val n = emb.count()
    val stride = math.max(n / nq, 1L)
    val qids = (0L until math.min(nq.toLong, n)).map(_ * stride)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    // the same planted near-dup construction as RecallProbe
    val planted = emb.filter(col("vec_id").isin(qids: _*))
      .crossJoin(spark.range(1, k + 1).toDF("dup_no"))
      .select(
        (lit(1000000000L) + col("vec_id") * lit(64L) + col("dup_no")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            (pmod(col("vec_id") * lit(131L) + col("dup_no") * lit(8191L)
                + i.cast("long") * lit(524287L), lit(1000L)).cast("double")
              / lit(500.0) - lit(1.0)) * lit(0.02)))
            .cast("float")).as("embedding"),
        col("label"))
    val augmented = emb.unionByName(planted).localCheckpoint(true)

    def bruteTruth(corpus: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
      collectHits(corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          VectorMath.cosineDouble(col("embedding"), col("q_emb")).as("cosine"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k))
    }
    val truth = bruteTruth(emb)
    val truthPlanted = bruteTruth(augmented)

    for {
      planes <- Seq(4, 5, 6)
      tables <- Seq(4, 8, 12, 16, 24)
    } {
      val bg = recallOf(collectHits(
        AnnLsh.topKBatch(emb, qids, k, tables = tables, planes = planes)), truth)
      val pl = recallOf(collectHits(
        AnnLsh.topKBatch(augmented, qids, k, tables = tables, planes = planes)),
        truthPlanted)
      val frac = tables.toDouble / (1 << planes)
      println(s"""{"family":"lsh","tables":$tables,"planes":$planes,""" +
        s""""frac":${jnum(frac)},"recall_bg":${jnum(bg)},"recall_planted":${jnum(pl)}}""")
    }

    val cells = math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt)
    val cents = Ivf.kmeansCentroids(emb, cells, 8, inputMaterialized = true)
    for (nprobe <- Seq(2, 4, 8, 12, 16, 24)) {
      val bg = recallOf(collectHits(
        Ivf.topKBatch(emb, cents, qids, k, nprobe = nprobe)), truth)
      val pl = recallOf(collectHits(
        Ivf.topKBatch(augmented, cents, qids, k, nprobe = nprobe)), truthPlanted)
      val frac = nprobe.toDouble / cells
      println(s"""{"family":"ivf","nprobe":$nprobe,"cells":$cells,""" +
        s""""frac":${jnum(frac)},"recall_bg":${jnum(bg)},"recall_planted":${jnum(pl)}}""")
    }
  }

  /** Locale-independent 3-decimal JSON number (the f-interpolator honors
    * the default locale; a comma separator would corrupt the JSON). */
  private def jnum(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def collectHits(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def recallOf(got: Map[Long, Set[Long]],
      truth: Map[Long, Set[Long]]): Double = {
    val per = truth.map { case (q, t) =>
      if (t.isEmpty) 1.0
      else got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    if (per.isEmpty) 0.0 else per.sum / per.size
  }
}
