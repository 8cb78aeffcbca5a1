package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The capstone front door at scale (r15 verdict ask #8): run
  * `Pipeline.ingestAndAssembleFrom` over a ≥100k-document MIXED corpus —
  * raw text files plus gzip AND zstd compressed JSONL — end to end
  * twice, and report timing plus replay bit-identity as one JSON line.
  *
  * The corpus is staged from an sf dir's documents table (one-time prep,
  * timed separately from the measured runs): a 100k-doc slice as ~16
  * .jsonl.gz shards, a second slice as .jsonl.zst shards, and 2,000
  * individual .txt files — the three front-door formats a real corpus
  * migration mixes. Both assembly runs execute the full ingest →
  * densify → curate → mix → epochs → shuffle → pack → writeShards
  * recipe into fresh output dirs; identity is set-equality of the
  * complete shard row sets.
  *
  * Usage: runMain graft.IngestScaleStudy <sfDir> <workDir>
  */
object IngestScaleStudy {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IngestScaleStudy <sfDir> <workDir>")
    val (sfDir, work) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-ingest-scale-study").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, work) finally spark.stop()
  }

  private def run(spark: SparkSession, sfDir: String, work: String): Unit = {
    val docs = Tables.documents(spark, sfDir)

    // --- corpus prep (not part of the measured ingest) ---
    def jsonLines(slice: org.apache.spark.sql.DataFrame) =
      slice.select(to_json(struct(
        col("doc_id").cast("string").as("id"), col("text"))).as("value"))
    jsonLines(docs.filter(col("doc_id") % 5 === 0)).repartition(16)
      .write.mode("overwrite").option("compression", "gzip")
      .text(s"$work/hf_gz")
    // Spark's text WRITER has no zstd codec in this build (read-side
    // resolves .zst through zstd-jni fine — the committed fixture pins
    // it) — so the prep stages plain shards and re-encodes them with
    // zstd-jni driver-side; 16 shards of a few MB each, prep-only work
    jsonLines(docs.filter(col("doc_id") % 5 === 1)).repartition(16)
      .write.mode("overwrite").text(s"$work/hf_zst_plain")
    val zstDir = new java.io.File(s"$work/hf_zst")
    org.apache.commons.io.FileUtils.deleteQuietly(zstDir)
    zstDir.mkdirs()
    val plainParts = Option(
      new java.io.File(s"$work/hf_zst_plain").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.getName.startsWith("part-"))
    require(plainParts.nonEmpty,
      s"zstd staging wrote no part files under $work/hf_zst_plain")
    plainParts.zipWithIndex.foreach { case (f, i) =>
      val out = new com.github.luben.zstd.ZstdOutputStream(
        new java.io.FileOutputStream(s"$work/hf_zst/part$i.jsonl.zst"))
      try java.nio.file.Files.copy(f.toPath, out)
      finally out.close()
    }
    val txtDir = new java.io.File(s"$work/txt")
    txtDir.mkdirs()
    val txtRows = docs.filter(col("doc_id") % 5 === 2).limit(2000)
      .select("doc_id", "text").collect()
    txtRows.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$work/txt/doc_${r.getLong(0)}.txt"),
        r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val nDocs = spark.read.text(s"$work/hf_gz").count() +
      spark.read.text(s"$work/hf_zst").count() + txtRows.length

    // --- the measured runs ---
    def assemble(out: String): (Double, Array[org.apache.spark.sql.Row]) = {
      val t0 = System.nanoTime()
      val shards = graft.operators.Pipeline.ingestAndAssembleFrom(spark,
        Map(
          "web" -> Tables.TextDir(s"$work/txt"),
          "hf_gz" -> (Tables.JsonlDir(s"$work/hf_gz"): Tables.CorpusDir),
          "hf_zst" -> (Tables.JsonlDir(s"$work/hf_zst"): Tables.CorpusDir)),
        Map("web" -> 20, "hf_gz" -> 50, "hf_zst" -> 30),
        budget = 2000000L, path = out, maxEpochs = 2, nShards = 32,
        packBudget = 2048L)
      val rows = spark.read.parquet(out).collect()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (secs1, rows1) = assemble(s"$work/shards_a")
    val (secs2, rows2) = assemble(s"$work/shards_b")
    val identical = rows1.map(_.toSeq).toSet == rows2.map(_.toSeq).toSet

    println(f"""{"metric":"ingest_assemble","docs":$nDocs,""" +
      f""""run_secs":$secs1%.2f,"replay_secs":$secs2%.2f,""" +
      f""""shard_rows":${rows1.length},"replay_identical":$identical,""" +
      s""""sf":"$sfDir"}""")
    require(identical, "replay produced different shards — determinism broken")
  }
}
