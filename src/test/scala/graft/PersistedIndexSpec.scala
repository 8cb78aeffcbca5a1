package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{AnnLsh, Ivf}
import graft.sources.Tables

/** The persisted, partition-pruned similarity indexes (Ivf.saveIndex /
  * AnnLsh.saveIndex): probes must (a) prune at the SCAN — the pruned-cell
  * predicate lands in the parquet relation's PartitionFilters, so a
  * 100-TB corpus read touches only the probed directories — and (b) stay
  * row-identical to the in-memory scan-and-filter path. Plus the
  * broadcast-kernel centroid path that replaces expression-embedded
  * centroid tables at large k.
  */
class PersistedIndexSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}
  import spark.implicits._

  private def embVec(id: Long): Array[Float] =
    Tables.embeddings(spark, sf).filter(col("vec_id") === id)
      .select("embedding").head.getSeq[Float](0).toArray

  /** The probe plan's scan must carry a non-empty partition filter over
    * the given column — pruning happens at planning, not post-scan.
    * With `strictUnder` set, the filter's INSET must also name FEWER
    * values than the full partition domain: presence alone would pass a
    * degenerate all-cells list, which reads every directory and
    * demonstrates nothing. */
  private def assertPartitionPruned(df: org.apache.spark.sql.DataFrame,
      partCol: String, strictUnder: Option[Int] = None): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1))
    assert(pf.exists(f => f.contains(partCol) && f.trim.nonEmpty),
      s"no $partCol partition filter at the scan:\n$plan")
    strictUnder.foreach { domain =>
      val inset = s"$partCol[^ ]* IN(SET)? \\(?([0-9, ]+)".r
        .findFirstMatchIn(pf.get).map(_.group(2))
      assert(inset.nonEmpty, s"no INSET over $partCol in: ${pf.get}")
      val values = inset.get.split(",").count(_.trim.nonEmpty)
      assert(values < domain,
        s"partition filter names all $values of $domain $partCol values " +
          s"(a full-domain INSET prunes nothing): ${pf.get}")
    }
  }

  test("persisted IVF probe prunes cell partitions and matches the in-memory path") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.kmeansCentroids(emb, 16, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Ivf.saveIndex(emb, cents, dir)
    val idx = Ivf.openIndex(spark, dir)

    val probe = Ivf.topKVec(idx, embVec(0L), 10, nprobe = 3,
      excludeId = Some(0L))
    // a strict subset of the 16 cells — nprobe=3 must plan as a 3-value
    // INSET, never a full-domain list
    assertPartitionPruned(probe, "cell", strictUnder = Some(16))

    val got = probe.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[String]("label"), r.getAs[Double]("cosine")))
    val want = Ivf.topKWith(emb, cents, 0L, 10, nprobe = 3).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[String]("label"), r.getAs[Double]("cosine")))
    assert(got.sameElements(want))

    // by-id probe over the index is the same rows again
    val byId = Ivf.topKIndexed(idx, 0L, 10, nprobe = 3).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[String]("label"), r.getAs[Double]("cosine")))
    assert(byId.sameElements(want))

    intercept[IllegalArgumentException] {
      Ivf.topKIndexed(idx, -999L, 10)
    }
  }

  test("persisted IVF probe reads only the probed cell directories") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.kmeansCentroids(emb, 16, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    Ivf.saveIndex(emb, cents, dir)
    val idx = Ivf.openIndex(spark, dir)
    val probe = Ivf.topKVec(idx, embVec(3L), 5, nprobe = 2)
    probe.collect()
    // after execution the scan reports its pruned file count: at most the
    // two probed directories' files (coalesced writes → 1 file per cell)
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty, "no file scan in the probe plan")
    val totalCells = idx.corpus.select("cell").distinct().count()
    assert(scan.get.metrics("numFiles").value <= 2 * (
      scan.get.relation.location.inputFiles.length / totalCells).max(1),
      s"probe read ${scan.get.metrics("numFiles").value} files for nprobe=2 of $totalCells cells")
  }

  test("persisted LSH probe prunes (t, bucket) partitions and matches topK") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    AnnLsh.saveIndex(emb, dir)
    val idx = AnnLsh.openIndex(spark, dir)
    assert(idx.tables === 24 && idx.planes === 5)

    val probe = AnnLsh.topKVec(idx, embVec(0L), 10, excludeId = Some(0L))
    assertPartitionPruned(probe, "bucket")

    val got = probe.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[String]("label"), r.getAs[Double]("cosine")))
    val want = AnnLsh.topK(emb, 0L, 10).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[String]("label"), r.getAs[Double]("cosine")))
    assert(got.sameElements(want))

    val byId = AnnLsh.topKIndexed(idx, 0L, 10).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[String]("label"), r.getAs[Double]("cosine")))
    assert(byId.sameElements(want))
  }

  test("persisted LSH probe agrees with topK across many queries") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("lshidx2").toString
    AnnLsh.saveIndex(emb, dir)
    val idx = AnnLsh.openIndex(spark, dir)
    Seq(1L, 7L, 31L, 100L).foreach { q =>
      val got = AnnLsh.topKIndexed(idx, q, 5).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      val want = AnnLsh.topK(emb, q, 5).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      assert(got.sameElements(want), s"query $q")
    }
  }

  test("appendToIndex makes new vectors probe-visible, identical to a rebuilt index") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") < 400)
    val fresh = emb.filter(col("vec_id") >= 400)
    val cents = Ivf.kmeansCentroids(old, 16, iters = 4)
    val incDir = java.nio.file.Files.createTempDirectory("ivfapp1").toString
    val fullDir = java.nio.file.Files.createTempDirectory("ivfapp2").toString
    Ivf.saveIndex(old, cents, incDir)
    Ivf.appendToIndex(incDir, fresh)
    Ivf.saveIndex(emb, cents, fullDir) // same centroids, built from the union
    val inc = Ivf.openIndex(spark, incDir)
    val full = Ivf.openIndex(spark, fullDir)
    Seq(0L, 450L).foreach { q =>
      val got = Ivf.topKIndexed(inc, q, 10, nprobe = 3).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      val want = Ivf.topKIndexed(full, q, 10, nprobe = 3).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      assert(got.sameElements(want), s"query $q")
      assert(got.nonEmpty)
    }
    // appended vectors actually surface as neighbors: an appended id's own
    // nearest list is reachable and non-empty through the incremental index
    assert(Ivf.topKIndexed(inc, 450L, 10, nprobe = 3).collect()
      .nonEmpty)

    // compaction collapses the append's extra files per cell and leaves
    // probes row-identical
    val before = Ivf.openIndex(spark, incDir).corpus.inputFiles.length
    Ivf.compactIndex(incDir, spark)
    val compacted = Ivf.openIndex(spark, incDir)
    assert(compacted.corpus.inputFiles.length < before,
      s"compaction did not reduce file count ($before)")
    Seq(0L, 450L).foreach { q =>
      val got = Ivf.topKIndexed(compacted, q, 10, nprobe = 3).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      val want = Ivf.topKIndexed(full, q, 10, nprobe = 3).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine")))
      assert(got.sameElements(want), s"post-compaction query $q")
    }
  }

  test("id-lookup secondary partition-prunes and stays consistent across append/compact") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.kmeansCentroids(emb.filter(col("vec_id") < 400), 16, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfbyid").toString
    Ivf.saveIndex(emb.filter(col("vec_id") < 400), cents, dir)
    val idx = Ivf.openIndex(spark, dir)
    assert(idx.byId.nonEmpty, "v2 layout must carry the id-lookup secondary")
    // the point fetch must prune to ONE idb directory — the fetch is the
    // step that would otherwise scan every cell file, linear in corpus
    val fetch = idx.byId.get
      .filter(col("idb") === (7L % 16) && col("vec_id") === 7L)
    // a single-bucket equality is the strongest possible pruning — the
    // INSET-shape helper doesn't apply, assert the equality lands in
    // PartitionFilters directly
    assertPartitionPruned(fetch, "idb")
    assert(fetch.queryExecution.executedPlan.toString
      .matches("(?s).*PartitionFilters: \\[[^\\]]*idb[^\\]]* = 7\\)?\\].*"),
      "fetch must prune to exactly one idb bucket")
    assert(fetch.select("embedding").limit(1).collect().nonEmpty)
    // append keeps primary and secondary row-consistent
    Ivf.appendToIndex(dir, emb.filter(col("vec_id") >= 400))
    val appended = Ivf.openIndex(spark, dir)
    assert(appended.byId.get.count() === appended.corpus.count())
    assert(appended.byId.get.select("vec_id").except(
      appended.corpus.select("vec_id")).count() === 0)
    // compact collapses the secondary's append files too, same rows
    val filesBefore = appended.byId.get.inputFiles.length
    Ivf.compactIndex(dir, spark)
    val compacted = Ivf.openIndex(spark, dir)
    assert(compacted.byId.get.inputFiles.length < filesBefore)
    assert(compacted.byId.get.count() === compacted.corpus.count())
  }

  test("outgrow warning fires only when the corpus exceeds build size by the factor") {
    val emb = Tables.embeddings(spark, sf)
    val seed = emb.filter(col("vec_id") < 100)
    val cents = Ivf.kmeansCentroids(seed, 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfgrow").toString
    Ivf.saveIndex(seed, cents, dir)
    // within factor: no warning
    assert(Ivf.outgrowWarning(spark, dir).isEmpty)
    Ivf.appendToIndex(dir, emb.filter(col("vec_id") >= 100 && col("vec_id") < 300))
    assert(Ivf.outgrowWarning(spark, dir).isEmpty,
      "3x build size is inside the 4x factor")
    // past factor: warning names the growth and the fix
    Ivf.appendToIndex(dir, emb.filter(col("vec_id") >= 300))
    val w = Ivf.outgrowWarning(spark, dir)
    assert(w.isDefined, "past 4x build size the maintenance warning must fire")
    assert(w.get.contains("saveIndex"))
    // the build-time baseline survives compaction (compact rewrites
    // files, not geometry — the warning must keep firing after it)
    Ivf.compactIndex(dir, spark)
    assert(Ivf.outgrowWarning(spark, dir).isDefined)
  }

  test("broadcast centroid kernel assigns identically to the literal kernel") {
    val rnd = new scala.util.Random(7)
    val dim = 12; val k = 19
    val centroids = Array.fill(k)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val vecs = (0 until 800).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val lit = Ivf.withCell(vecs, centroids)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bc = Ivf.withCellBroadcast(vecs, centroids)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lit === bc)
  }

  test("broadcast kernel path also drives k-means + probe end to end") {
    // same corpus, centroids learned normally; assignment forced through
    // the broadcast kernel for the whole probe — rows must match
    val emb = Tables.embeddings(spark, sf)
    val cents = Ivf.kmeansCentroids(emb, 8, iters = 2)
    val litCells = Ivf.withCell(emb, cents).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bcCells = Ivf.withCellBroadcast(emb, cents).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(litCells === bcCells)
  }
}
