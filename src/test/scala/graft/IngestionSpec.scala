package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Sampling, TextAnalysis}
import graft.sources.Tables

/** The corpus front doors: raw-text / binary directory ingestion into
  * the engine's documents / multimodal shapes, the ORC round-trip, and
  * densifyIds — the documented Lehmer-domain escape hatch. */
class IngestionSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeTextFiles(dir: String, docs: Seq[(String, String)]): Unit =
    docs.foreach { case (name, text) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

  test("text-dir ingestion yields the documents shape and feeds the tx_ operators") {
    val dir = tmp("ingest-txt")
    writeTextFiles(dir, Seq(
      "a.txt" -> "the quick brown fox jumps over the lazy dog",
      "b.txt" -> "pack my box with five dozen liquor jugs",
      "c.txt" -> "sphinx of black quartz judge my vow"))
    val docs = Tables.ingestTextDir(spark, dir, source = "web")
    val rows = docs.collect()
    assert(rows.length === 3)
    assert(docs.columns.toSeq ===
      Seq("doc_id", "source", "text", "n_chars", "path"))
    assert(rows.forall(_.getAs[String]("source") == "web"))
    // n_chars matches the text, doc_ids are distinct and deterministic
    assert(rows.forall(r =>
      r.getAs[Long]("n_chars") == r.getAs[String]("text").length.toLong))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 3)
    val again = Tables.ingestTextDir(spark, dir, source = "web").collect()
    assert(again.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet
      === rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet)
    // the ingested frame IS a documents frame: tx_ operators run on it
    val stats = TextAnalysis.tokenStats(docs.drop("path")).collect()
    assert(stats.length === 3 && stats.forall(_.getAs[Long]("n_tokens") >= 6L))
  }

  test("binary-dir ingestion yields the multimodal shape and feeds the mm_ operators") {
    val dir = tmp("ingest-bin")
    val payloads = Seq("img0" -> Array.range(0, 64).map(_.toByte),
      "img1" -> Array.range(64, 160).map(_.toByte))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"$name.bin"), bytes)
    }
    val media = Tables.ingestBinaryDir(spark, dir, pattern = "*.bin")
    val rows = media.collect()
    assert(rows.length === 2)
    assert(media.columns.toSeq ===
      Seq("doc_id", "payload", "n_bytes", "path", "mod_time"))
    assert(rows.map(_.getAs[Long]("n_bytes")).sorted.toSeq === Seq(64L, 96L))
    // payload bytes survive verbatim
    val byLen = rows.map(r =>
      r.getAs[Long]("n_bytes") -> r.getAs[Array[Byte]]("payload")).toMap
    assert(byLen(64L).toSeq === payloads.head._2.toSeq)
    // the mm_ feature extractor consumes the ingested payload column
    val feats = Multimodal.extractFeatures(
      media.select(col("doc_id"), col("payload"))).collect()
    assert(feats.length === 2)
  }

  test("ORC round-trips the documents table bit-exactly") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("orc-docs")
    Tables.writeOrc(docs, dir)
    val back = Tables.readOrc(spark, dir)
    assert(back.schema === docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("ingestAndAssemble: raw text directories to replayable training shards") {
    // two corpora of raw files — enough docs that curation + mixing keep
    // a non-trivial subset (long clean sentences score medium+)
    val webDir = tmp("corpus-web")
    val codeDir = tmp("corpus-code")
    val sent = "the quick brown fox jumps over the lazy dog and then " +
      "walks in to the town to see a friend of the family"
    writeTextFiles(webDir, (0 until 12).map(i => s"w$i.txt" -> s"$sent w$i"))
    writeTextFiles(codeDir, (0 until 8).map(i => s"c$i.txt" -> s"$sent c$i"))
    val out = tmp("shards-out")
    val assembled = graft.operators.Pipeline.ingestAndAssemble(spark,
      Map("web" -> webDir, "code" -> codeDir),
      Map("web" -> 60, "code" -> 40),
      budget = 30L, path = out, maxEpochs = 2, nShards = 4, packBudget = 64L)
    val rows = assembled.collect()
    assert(rows.nonEmpty, "assembly kept nothing from the ingested corpora")
    assert(rows.map(_.getAs[String]("source")).toSet.subsetOf(Set("web", "code")))
    // doc ids were densified into the Lehmer domain
    assert(rows.forall(r => r.getAs[Long]("doc_id") >= 0L &&
      r.getAs[Long]("doc_id") < 20L))
    // shards landed on disk and replay non-empty
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    assert(spark.read.parquet(out).count() === rows.length)
    // a typo'd mixture key must fail fast, not silently drop a corpus
    intercept[IllegalArgumentException] {
      graft.operators.Pipeline.ingestAndAssemble(spark,
        Map("web" -> webDir, "code" -> codeDir),
        Map("web" -> 60, "cod" -> 40), budget = 30L, path = tmp("never"))
    }
    // deterministic: a second run over the same directories replays
    // bit-identically (the densify order is the unique file path)
    val again = graft.operators.Pipeline.ingestAndAssemble(spark,
      Map("web" -> webDir, "code" -> codeDir),
      Map("web" -> 60, "code" -> 40),
      budget = 30L, path = tmp("shards-out2"), maxEpochs = 2, nShards = 4,
      packBudget = 64L).collect()
    assert(again.map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("jsonl-dir ingestion reads plain, gz and zst lines into the documents shape") {
    // committed fixtures: docs0.jsonl (2 with ids + 1 id-less),
    // docs1.jsonl.gz (2 good + 1 malformed + 1 blank + 1 text-less),
    // docs2.jsonl.zst (2 with NUMERIC ids) — 7 documents total; the
    // codecs resolve from the extensions alone
    val dir = getClass.getResource("/jsonl").getPath
    val docs = Tables.ingestJsonlDir(spark, dir, source = "hf")
    val rows = docs.collect()
    assert(docs.columns.toSeq ===
      Seq("doc_id", "source", "text", "n_chars", "path"))
    assert(rows.length === 7,
      s"expected 7 documents, got ${rows.length}: malformed/blank/" +
        "text-less lines must drop, good lines must all survive")
    assert(rows.forall(_.getAs[String]("source") == "hf"))
    assert(rows.forall(r =>
      r.getAs[Long]("n_chars") == r.getAs[String]("text").length.toLong))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 7)
    val texts = rows.map(_.getAs[String]("text")).toSet
    assert(texts.contains("sphinx of black quartz judge my vow"), "gz doc lost")
    assert(texts.contains("jackdaws love my big sphinx of quartz"), "zst doc lost")
    assert(texts.contains("no id on this line so the text hash names it"))
    // deterministic: a re-read yields the same (doc_id, text) mapping
    val again = Tables.ingestJsonlDir(spark, dir, source = "hf").collect()
    assert(again.map(r => (r.getLong(0), r.getString(2))).toSet ===
      rows.map(r => (r.getLong(0), r.getString(2))).toSet)
    // and the ingested frame IS a documents frame: tx_ operators run on it
    val stats = TextAnalysis.tokenStats(docs.drop("path")).collect()
    assert(stats.length === 7 && stats.forall(_.getAs[Long]("n_tokens") >= 6L))
    // densify is partitioning-stable over it (the Lehmer escape hatch)
    val d1 = Sampling.densifyIds(docs, Seq("path", "doc_id")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dense_id"))).toMap
    val d2 = Sampling.densifyIds(docs.repartition(5), Seq("path", "doc_id"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dense_id"))).toMap
    assert(d1 === d2)
  }

  test("jsonl reused ids never alias: same id + different text keeps two identities") {
    val dir = tmp("ingest-dupid")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d.jsonl"),
      Seq(
        """{"id": "k1", "text": "first payload under a reused id"}""",
        """{"id": "k1", "text": "second payload under the same id"}""",
        """{"id": "k2", "text": "first payload under a reused id"}"""
      ).mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val docs = Tables.ingestJsonlDir(spark, dir)
    val rows = docs.collect()
    assert(rows.length === 3)
    // same id + different text → distinct doc_ids (a malformed export
    // must not alias two documents); same text + different id → distinct
    // doc_ids (two legitimate copies keep their identities)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 3)
    // with aliasing gone, (path, doc_id) is a total order again and
    // dense-id assignment is partitioning-independent
    val d1 = Sampling.densifyIds(docs, Seq("path", "doc_id")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dense_id"))).toMap
    val d2 = Sampling.densifyIds(docs.repartition(3), Seq("path", "doc_id"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dense_id"))).toMap
    assert(d1 === d2)
  }

  test("ingestAndAssembleFrom mixes a text corpus with a jsonl corpus, replay bit-identical") {
    val webDir = tmp("corpus-web2")
    val sent = "the quick brown fox jumps over the lazy dog and then " +
      "walks in to the town to see a friend of the family"
    writeTextFiles(webDir, (0 until 10).map(i => s"w$i.txt" -> s"$sent w$i"))
    // a jsonl corpus written by the engine's own line shape (plain —
    // codec handling is pinned by the fixture test above)
    val hfDir = tmp("corpus-hf")
    writeTextFiles(hfDir, Seq("part0.jsonl" ->
      (0 until 8).map(i =>
        s"""{"id":"h$i","text":"$sent h$i"}""").mkString("\n")))
    val out = tmp("shards-out-hf")
    def run(outDir: String) = graft.operators.Pipeline.ingestAndAssembleFrom(
      spark,
      Map("web" -> Tables.TextDir(webDir),
        "hf" -> (Tables.JsonlDir(hfDir): Tables.CorpusDir)),
      Map("web" -> 50, "hf" -> 50),
      budget = 24L, path = outDir, maxEpochs = 2, nShards = 4,
      packBudget = 64L)
    val rows = run(out).collect()
    assert(rows.nonEmpty, "assembly kept nothing from the ingested corpora")
    assert(rows.map(_.getAs[String]("source")).toSet === Set("web", "hf"),
      "one ingestion format vanished from the shards")
    assert(rows.forall(r => r.getAs[Long]("doc_id") >= 0L &&
      r.getAs[Long]("doc_id") < 18L))
    assert(spark.read.parquet(out).count() === rows.length)
    val again = run(tmp("shards-out-hf2")).collect()
    assert(again.map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("densifyIds: bijective 0..n-1, order-consistent, partitioning-stable, Lehmer-safe") {
    // hash-width ids (the ingestTextDir contract) densified into the
    // sampleKey domain
    val wide = Seq(
      (8714349872330411920L, "a"), (-3L, "b"), (42L, "c"),
      (2147483647L, "d"), (-9104071444059791219L, "e"))
      .toDF("doc_id", "text")
    val dense = Sampling.densifyIds(wide).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dense_id")))
    assert(dense.map(_._2).sorted.toSeq === (0L until 5L))
    // order-consistent: dense ids ascend with the sort column
    assert(dense.sortBy(_._1).map(_._2).toSeq === (0L until 5L))
    // partitioning-stable: a different input layout gives the same map
    val re = Sampling.densifyIds(wide.repartition(7)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dense_id"))).toMap
    assert(dense.toMap === re)
    // the output feeds sampleKey without tripping the domain guard
    val keyed = Sampling.densifyIds(wide)
      .select(Sampling.sampleKey(col("dense_id")).as("k")).collect()
    assert(keyed.length === 5)
  }
}
