package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Packing, Pipeline, Sampling, TextAnalysis}
import graft.sources.Tables

/** The dataset-assembly capstone: Pipeline.assembleDataset must be
  * nothing more than the staged `ds_` / `tx_` operators chained — same
  * rows, same assignments — and Sampling.writeShards must lay the result
  * down so a reader replays the Lehmer permutation from the shard files
  * alone. */
class AssemblySpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  private val weights = Map("src0" -> 50, "src2" -> 30, "src4" -> 20)
  private def docs = Tables.documents(spark, sf)
  private lazy val assembled = Pipeline.assembleDataset(
    docs, weights, budget = 150L, maxEpochs = 3, nShards = 8,
    packBudget = 64L).cache()

  test("assembled output is non-empty and instance-unique") {
    val n = assembled.count()
    assert(n > 0, "assembly produced no instances at sf0.001")
    assert(assembled.select("instance_id").distinct.count() == n)
    assert(assembled.select("doc_id", "epoch").distinct.count() == n)
  }

  test("composed (doc, epoch) instances equal the staged curate→mix→epochs chain") {
    val staged = Sampling.epochPlan(
      Sampling.mixToTarget(TextAnalysis.curateKeep(docs), weights)
        .drop("rate_ppm", "sample_key"),
      weights, budget = 150L, maxEpochs = 3)
      .select("doc_id", "epoch")
    assert(staged.exceptAll(assembled.select("doc_id", "epoch")).isEmpty)
    assert(assembled.select("doc_id", "epoch").exceptAll(staged).isEmpty)
  }

  test("composed shard/pos equal the staged shuffleInstances on instance ids") {
    val staged = Sampling.shuffleInstances(
      assembled.select("doc_id", "epoch", "instance_id"),
      "instance_id", 8).select("instance_id", "shard", "pos")
    val composed = assembled.select("instance_id", "shard", "pos")
    assert(staged.exceptAll(composed).isEmpty)
    assert(composed.exceptAll(staged).isEmpty)
  }

  test("capstone token counts are TextAnalysis.tokenCount — one budget unit engine-wide") {
    // the pack stage's n_tokens must be the SAME counter tx_tokens
    // bills with, per doc — a budget calibrated against tokenStats
    // output packs identically in the capstone
    val official = TextAnalysis.tokenStats(docs).select("doc_id", "n_tokens")
    val bad = assembled.select("doc_id", "n_tokens").distinct()
      .join(official.withColumnRenamed("n_tokens", "official"), "doc_id")
      .filter(col("n_tokens") =!= col("official")).count()
    assert(bad == 0, "assembleDataset n_tokens diverged from tx_tokens' counter")
  }

  test("pack columns are the per-shard prefix-sum in pos order") {
    val staged = Packing.assignSequences(
      assembled.select("instance_id", "shard", "pos", "n_tokens"),
      budget = 64L, orderCol = "pos")
      .select("instance_id", "start_tok", "seq_id", "seq_offset", "n_seqs")
    val composed = assembled.select("instance_id", "start_tok", "seq_id",
      "seq_offset", "n_seqs")
    assert(staged.exceptAll(composed).isEmpty)
    assert(composed.exceptAll(staged).isEmpty)
    // prefix-sum sanity: per shard, max(start_tok + n_tokens) == sum(n_tokens)
    val bad = assembled.groupBy("shard")
      .agg(max(col("start_tok") + col("n_tokens")).as("hi"),
        sum(col("n_tokens")).as("total"))
      .filter(col("hi") =!= col("total")).count()
    assert(bad == 0)
  }

  test("pos is a dense 1..n ranking per shard and epochs of a doc can split across shards") {
    import spark.implicits._
    val bad = assembled.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("nd"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
    // at least one multi-epoch doc lands on more than one shard — the
    // point of shuffling INSTANCES rather than documents
    val spread = assembled.groupBy("doc_id")
      .agg(countDistinct("shard").as("nsh"), count(lit(1)).as("nep"))
      .filter($"nep" > 1 && $"nsh" > 1).count()
    assert(spread > 0, "every multi-epoch doc stayed on a single shard")
  }

  test("one shard exchange serves both the pos window and the pack prefix-sum") {
    spark.sharedState.cacheManager.clearCache()
    val p = Pipeline.assembleDataset(docs, weights, budget = 150L,
      maxEpochs = 3, nShards = 8, packBudget = 64L)
      .queryExecution.executedPlan.toString
    val shardExchanges = "Exchange hashpartitioning\\(shard".r.findAllIn(p).length
    assert(shardExchanges <= 1, s"$shardExchanges shard exchanges:\n$p")
  }

  test("writeShards lays down shard directories that replay the permutation") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      Sampling.writeShards(assembled, dir)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shardDirs.length == assembled.select("shard").distinct.count())
      val back = spark.read.parquet(dir)
      // per shard, reading in pos order yields exactly the assembled
      // frame's instance sequence for that shard
      val joined = back.select(col("instance_id"), col("pos"),
          col("shard").cast("long").as("shard"))
        .join(assembled.select(col("instance_id").as("instance_id"),
          col("pos").as("exp_pos"), col("shard").as("exp_shard")), "instance_id")
      assert(joined.filter(col("pos") =!= col("exp_pos") ||
        col("shard") =!= col("exp_shard")).count() == 0)
      assert(back.count() == assembled.count())
      // a single-shard read prunes to that shard's directory
      spark.sharedState.cacheManager.clearCache()
      val pruned = spark.read.parquet(dir).filter(col("shard") === 3)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("shard"), plan)
      assert(pruned.count() ==
        assembled.filter(col("shard") === 3L).count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("shard manifest round-trips and the validator catches every tamper class") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards-man").toString
    try {
      Sampling.writeShards(assembled, dir)
      Sampling.writeShardManifest(spark, dir)
      // the manifest is invisible to parquet readers (underscore file)
      assert(spark.read.parquet(dir).count() === assembled.count())
      // a freshly-written artifact validates clean
      assert(Sampling.validateShards(spark, dir).count() === 0)
      // read-order independence: the checksum is an order-insensitive
      // aggregate (sum of row hashes mod 2^64 since r17), so a
      // re-laid-out (but row-identical) shard still validates — rewrite
      // shard 0 from a scrambled re-read of itself
      val scratch = java.nio.file.Files.createTempDirectory("shards-scr").toString
      // operate on shard dirs that actually exist (not every residue in
      // [0, nShards) necessarily received rows at this corpus size)
      val Seq(sa, sb, sc) = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
        .map(_.getName).sorted.take(3).toSeq
      val s0 = spark.read.parquet(s"$dir/$sa").repartition(5)
      s0.write.mode("overwrite").parquet(s"$scratch/t0")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/$sa"))
      spark.read.parquet(s"$scratch/t0").write.parquet(s"$dir/$sa")
      assert(Sampling.validateShards(spark, dir).count() === 0)
      // tampering with a row flags that shard's checksum (same row count)
      val tampered = spark.read.parquet(s"$dir/$sb")
        .withColumn("pos", when(col("pos") === min("pos").over(
          org.apache.spark.sql.expressions.Window.orderBy("pos")),
          lit(999999L)).otherwise(col("pos")))
      tampered.write.mode("overwrite").parquet(s"$scratch/t1")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/$sb"))
      spark.read.parquet(s"$scratch/t1").write.parquet(s"$dir/$sb")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(scratch))
      val v1 = Sampling.validateShards(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(v1.contains((sb, "checksum_mismatch")), v1.toSeq)
      assert(!v1.exists(_._2 == "rows_mismatch"), v1.toSeq)
      // a vanished shard directory flags shard_missing
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/$sc"))
      assert(Sampling.validateShards(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)))
        .contains((sc, "shard_missing")))
      // a missing manifest is its own violation, not an exception
      new java.io.File(s"$dir/_manifest.json").delete()
      assert(Sampling.validateShards(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
        Seq(("<manifest>", "manifest_not_found")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("shard checksum catches even-count identical-row tampering and null swaps") {
    // the two silent false-pass classes of the pre-r17 bit_xor checksum
    // (r16 advice): (1) XOR of two identical row hashes is 0, so
    // tampering BOTH copies of a duplicated row identically left the
    // checksum unchanged at unchanged row count; (2) xxhash64 skips null
    // inputs, so two rows differing only in WHICH of two adjacent
    // columns holds the value vs null hashed identically. The modular
    // sum + per-column null sentinel must flag both.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards-cls").toString
    val scratch = java.nio.file.Files.createTempDirectory("shards-cls-s").toString
    try {
      // shard 0 carries a DUPLICATED row ("b") and a null-bearing pair
      Seq((1L, Option("a"), Option.empty[String], 0L),
          (2L, Option("b"), Option("x"), 0L),
          (2L, Option("b"), Option("x"), 0L),
          (3L, Option("v"), Option.empty[String], 0L))
        .toDF("doc_id", "c1", "c2", "shard")
        .write.mode("overwrite").partitionBy("shard").parquet(dir)
      Sampling.writeShardManifest(spark, dir)
      assert(Sampling.validateShards(spark, dir).count() === 0)
      // class 1: modify BOTH copies of the duplicated row identically
      val evenTamper = spark.read.parquet(s"$dir/shard=0")
        .withColumn("c1", when(col("c1") === "b", "TAMPERED")
          .otherwise(col("c1")))
      evenTamper.write.parquet(s"$scratch/t")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/shard=0"))
      spark.read.parquet(s"$scratch/t").write.parquet(s"$dir/shard=0")
      val v1 = Sampling.validateShards(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(v1.contains(("shard=0", "checksum_mismatch")), v1)
      assert(!v1.exists(_._2 == "rows_mismatch"), v1)
      // class 2: swap which of two adjacent columns holds the value —
      // rebuild the artifact clean, then move row 3's "v" from c1 to c2
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      Seq((1L, Option("a"), Option.empty[String], 0L),
          (3L, Option("v"), Option.empty[String], 0L))
        .toDF("doc_id", "c1", "c2", "shard")
        .write.mode("overwrite").partitionBy("shard").parquet(dir)
      Sampling.writeShardManifest(spark, dir)
      val nullSwap = spark.read.parquet(s"$dir/shard=0")
        .withColumn("c2", when(col("doc_id") === 3L, col("c1"))
          .otherwise(col("c2")))
        .withColumn("c1", when(col("doc_id") === 3L, lit(null: String))
          .otherwise(col("c1")))
      nullSwap.write.mode("overwrite").parquet(s"$scratch/t2")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/shard=0"))
      spark.read.parquet(s"$scratch/t2").write.parquet(s"$dir/shard=0")
      val v2 = Sampling.validateShards(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(v2.contains(("shard=0", "checksum_mismatch")), v2)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
    }
  }

  test("sampleKey enforces the Lehmer domain: aliasing ids fail loudly") {
    import spark.implicits._
    // in-domain ids: plain arithmetic, bijective on [1, 2^31-2]
    val ok = Seq(0L, 1L, 2147483646L).toDF("doc_id")
      .select(Sampling.sampleKey(col("doc_id")).as("k")).collect()
    assert(ok.map(_.getLong(0)).toSeq ===
      Seq(0L, 48271L, (2147483646L * 48271L) % 2147483647L))
    // at/past the modulus the map would silently alias (2^31-1 -> 0,
    // like id 0) — the guard turns that into a loud per-row failure
    val err = intercept[Exception] {
      Seq(2147483647L).toDF("doc_id")
        .select(Sampling.sampleKey(col("doc_id"))).collect()
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("Lehmer domain"), err.getMessage)
    val neg = intercept[Exception] {
      Seq(-5L).toDF("doc_id")
        .select(Sampling.sampleKey(col("doc_id"))).collect()
    }
    assert(neg.getMessage != null &&
      neg.getMessage.contains("Lehmer domain"), neg.getMessage)
  }

  test("writeShards' plan is one exchange: the partition-by-shard the write needs") {
    val input = assembled.localCheckpoint()
    val writeSide = input.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
    val p = writeSide.queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(p).length
    assert(exchanges == 1, s"$exchanges exchanges in the shard-write plan:\n$p")
  }
}
