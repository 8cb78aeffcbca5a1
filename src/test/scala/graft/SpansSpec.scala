package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** dd_spans (Dedup.repeatedSpans): position-resolved substring dedup —
  * planted shared runs must surface with exact token bounds, intra-doc
  * repetition must not, and touching shared runs must merge into one
  * maximal span. */
class SpansSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def spans(rows: (Long, String)*): Map[Long, Seq[(Long, Long, Long, Long)]] =
    Dedup.repeatedSpans(rows.toDF("doc_id", "text"), k = 3)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap

  test("a planted shared run surfaces in both docs with exact token bounds") {
    // docs 1 and 2 share tokens "s1 s2 s3 s4" (4 tokens → 2 shared 3-grams)
    val got = spans(
      1L -> "a1 a2 s1 s2 s3 s4 a3 a4",
      2L -> "b1 s1 s2 s3 s4 b2 b3 b4",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8")
    // doc 1: gram positions 2,3 duplicated → span tokens [2, 5]
    assert(got(1L) === Seq((2L, 5L, 2L, 4L)))
    // doc 2: gram positions 1,2 → span tokens [1, 4]
    assert(got(2L) === Seq((1L, 4L, 2L, 4L)))
    assert(!got.contains(3L), "an unshared doc grew a span")
  }

  test("intra-document repetition alone is not a span (cross-doc contract)") {
    val got = spans(
      1L -> "x1 x2 x3 x1 x2 x3 x1 x2 x3",
      2L -> "y1 y2 y3 y4 y5 y6 y7 y8 y9")
    assert(got.isEmpty,
      s"intra-doc repeats must be tx_repetition's signal, not spans: $got")
  }

  test("separated shared runs stay separate spans; adjacent ones merge maximal") {
    val got = spans(
      1L -> "s1 s2 s3 m1 m2 m3 m4 t1 t2 t3",
      2L -> "s1 s2 s3 z1 z2 z3 z4 z5 z6 z7",
      3L -> "w1 w2 w3 w4 w5 w6 w7 t1 t2 t3")
    // doc 1: "s1 s2 s3" (gram pos 0) and "t1 t2 t3" (gram pos 7) — two
    // separated spans, 3 tokens each
    assert(got(1L) === Seq((0L, 2L, 1L, 3L), (7L, 9L, 1L, 3L)))
    // a doc whose whole text is shared collapses to ONE maximal span
    val whole = spans(
      10L -> "p1 p2 p3 p4 p5 p6",
      11L -> "p1 p2 p3 p4 p5 p6")
    assert(whole(10L) === Seq((0L, 5L, 4L, 6L)))
    assert(whole(11L) === Seq((0L, 5L, 4L, 6L)))
  }

  test("token-overlapping gram runs merge into one maximal span (gap < k)") {
    // doc 1's grams at positions 0 ("g1 g2 g3") and 2 ("g3 g4 g5") are
    // each shared with a DIFFERENT doc; position 1 ("g2 g3 g4") is not.
    // Their token ranges [0,2] and [2,4] overlap, so the contract
    // ("maximal token ranges a span-removal pass would cut") demands ONE
    // span [0,4] — two overlapping spans would double-count token 2.
    val got = spans(
      1L -> "g1 g2 g3 g4 g5 q1 q2",
      2L -> "z1 g1 g2 g3 z2 z3 z4",
      3L -> "g3 g4 g5 y1 y2 y3 y4")
    assert(got(1L) === Seq((0L, 4L, 2L, 5L)),
      s"overlapping gram ranges must merge: ${got(1L)}")
    assert(got(2L) === Seq((1L, 3L, 1L, 3L)))
    assert(got(3L) === Seq((0L, 2L, 1L, 3L)))
  }

  test("abutting gram ranges merge (gap = k); a one-token hole splits (gap = k+1)") {
    // positions 0 and 3 with k=3: ranges [0,2] + [3,5] abut — the covered
    // token set is contiguous, one maximal span [0,5]
    val abut = spans(
      1L -> "g1 g2 g3 h1 h2 h3 q1",
      2L -> "z1 g1 g2 g3 z2 z3 z4",
      3L -> "h1 h2 h3 y1 y2 y3 y4")
    assert(abut(1L) === Seq((0L, 5L, 2L, 6L)),
      s"abutting gram ranges must merge: ${abut(1L)}")
    // positions 0 and 4 with k=3: ranges [0,2] and [4,6] leave token 3
    // uncovered — two spans, nothing phantom-counted
    val hole = spans(
      1L -> "g1 g2 g3 u0 h1 h2 h3",
      2L -> "z1 g1 g2 g3 z2 z3 z4",
      3L -> "h1 h2 h3 y1 y2 y3 y4")
    assert(hole(1L) === Seq((0L, 2L, 1L, 3L), (4L, 6L, 1L, 3L)),
      s"a covered-token hole must split spans: ${hole(1L)}")
  }

  test("short documents compare via their single truncated gram") {
    val got = spans(
      1L -> "tiny doc",
      2L -> "tiny doc",
      3L -> "other text")
    // both 2-token docs yield one truncated gram at pos 0; k-1 padding
    // still reports the nominal gram width (the contract: span_end =
    // last gram pos + k - 1, positions are gram starts)
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L).head._1 === 0L)
  }
}
