package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The sf1 scaling study (SURVEY §13) rests on ScaleUp producing a
  * corpus with the same per-key shape at N× the rows — so that claim is
  * specced, not assumed: replica key spaces must not collide, every
  * intra-replica FK relationship must survive, dimensions stay
  * single-copy, and the document/embedding replicas must preserve
  * within-replica duplicate structure without creating cross-replica
  * near-duplicates. */
class ScaleUpSpec extends AnyFunSuite {
  import TestSpark.spark

  private val src = "/root/testdata/sf0.001"
  private lazy val dest = {
    val d = java.nio.file.Files.createTempDirectory("scaleup-spec").toString
    ScaleUp.run(spark, src, d, factor = 2)
    d
  }

  test("row counts scale by the factor; dimensions stay single-copy") {
    // events goes through the canonical schema-adaptive Tables.events
    // reader — the stored ts form (ns-as-long vs µs TIMESTAMP) is a
    // writer detail the rest of the suite must not assume
    def count(dir: String, t: String): Long =
      if (t == "events") Tables.events(spark, dir).count()
      else spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val n0 = count(src, t)
      val n1 = count(dest, t)
      assert(n1 === 2 * n0, s"$t scaled ${n1.toDouble / n0}x, expected 2x")
    }
    for (t <- Seq("region", "nation"))
      assert(spark.read.parquet(s"$dest/$t.parquet").count() ===
        spark.read.parquet(s"$src/$t.parquet").count())
  }

  test("keys stay unique and every FK relationship survives replication") {
    def ids(t: String, c: String) =
      (if (t == "events") Tables.events(spark, dest)
       else spark.read.parquet(s"$dest/$t.parquet")).select(col(c))
    // primary keys unique across replicas (no collision from the shift)
    for ((t, c) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "part" -> "p_partkey", "supplier" -> "s_suppkey",
        "documents" -> "doc_id", "embeddings" -> "vec_id",
        "events" -> "event_id"))
      assert(ids(t, c).distinct().count() === ids(t, c).count(),
        s"$t.$c collides across replicas")
    // FKs: every orders.o_custkey resolves, every lineitem key resolves
    assert(ids("orders", "o_custkey")
      .join(ids("customer", "c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti").count() === 0)
    assert(ids("lineitem", "l_orderkey")
      .join(ids("orders", "o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count() === 0)
    assert(ids("lineitem", "l_partkey")
      .join(ids("part", "p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_anti").count() === 0)
    assert(ids("lineitem", "l_suppkey")
      .join(ids("supplier", "s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_anti").count() === 0)
  }

  test("per-replica join shape is preserved: lineitems per order unchanged") {
    val perOrder0 = spark.read.parquet(s"$src/lineitem.parquet")
      .groupBy("l_orderkey").count().groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perOrder1 = spark.read.parquet(s"$dest/lineitem.parquet")
      .groupBy("l_orderkey").count().groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perOrder1 === perOrder0.map { case (k, v) => k -> 2 * v })
  }

  test("document replicas keep linear duplicate density: no cross-replica token overlap") {
    val docs = spark.read.parquet(s"$dest/documents.parquet")
    val n0 = spark.read.parquet(s"$src/documents.parquet").count()
    // replica 1 ids sit one doc-id-domain above replica 0
    val r0Tokens = docs.filter(col("doc_id") < n0)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
    val r1Tokens = docs.filter(col("doc_id") >= n0)
      .select(explode(split(col("text"), " ")).as("tok")).distinct()
    assert(r0Tokens.join(r1Tokens, "tok").count() === 0,
      "salted replica shares tokens with the original — duplicate " +
        "density would scale quadratically, not linearly")
    // exact-dup structure within each replica matches the original
    val dups0 = graft.operators.Dedup.exact(
      Tables.documents(spark, src)).filter(col("is_duplicate")).count()
    val dups1 = graft.operators.Dedup.exact(docs.filter(col("doc_id") >= n0))
      .filter(col("is_duplicate")).count()
    assert(dups1 === dups0)
  }

  test("embedding replicas preserve norms and rotate out of alignment") {
    val emb = spark.read.parquet(s"$dest/embeddings.parquet")
    val n0 = spark.read.parquet(s"$src/embeddings.parquet").count()
    val a = emb.filter(col("vec_id") === 0L)
      .select("embedding").head.getSeq[Float](0)
    val b = emb.filter(col("vec_id") === lit(n0))
      .select("embedding").head.getSeq[Float](0)
    // rotation ∘ sign-flip: same multiset of |components| (norms exact —
    // float negation is lossless), but not the same vector
    assert(a.map(math.abs).sorted === b.map(math.abs).sorted)
    assert(a !== b)
  }

  test("ScaleUp composes: scaling a scaled corpus keeps duplicate density linear") {
    // the r14 third-scale-point study scaled sf0.1→sf1→sf10 and the old
    // identity-replica / pure-rotation transforms composed into 45,728
    // verbatim twin documents and 162,000 verbatim twin vectors at sf10
    // (slopes read 43-97× instead of the corpus's growth). This pins the
    // fix: after scaling TWICE, exact-duplicate mass scales by exactly
    // the total factor — no cross-application collisions.
    val d2 = java.nio.file.Files.createTempDirectory("scaleup-spec2").toString
    ScaleUp.run(spark, dest, d2, factor = 2)
    def dupMass(dir: String, table: String, c: String): Long = {
      val df = spark.read.parquet(s"$dir/$table.parquet")
      df.count() - df.select(col(c)).distinct().count()
    }
    assert(dupMass(d2, "documents", "text") ===
      4 * dupMass(src, "documents", "text"),
      "composed document replicas planted cross-application verbatim twins")
    assert(dupMass(d2, "embeddings", "embedding") ===
      4 * dupMass(src, "embeddings", "embedding"),
      "composed embedding replicas planted cross-application verbatim twins")
  }
}
