package graft

import graft.ops.DupSpans
import org.apache.spark.sql.functions._

/** DupSpans semantics on hand-checkable corpora: cross-doc duplicate
  * detection, within-doc repeats, span merging at the touch boundary,
  * and excision keeping order.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5

  private def spansOf(docs: Seq[(Long, String)]) = {
    val df = docs.toDF("doc_id", "text")
    DupSpans.spans(DupSpans.dupStarts(
        DupSpans.gramPositions(df, "doc_id", "text", K)), K)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
  }

  test("a shared 6-token run yields one maximal span in each doc") {
    // doc 0: run at positions 0-5; doc 1: run at positions 2-7.
    // Two dup 5-gram starts per doc (overlapping) merge to one span.
    val spans = spansOf(Seq(
      0L -> "a b c d e f x1 x2",
      1L -> "z1 z2 a b c d e f"))
    assert(spans == Set((0L, 0L, 5L, 2L), (1L, 2L, 7L, 2L)))
  }

  test("a within-doc repeat is duplication; gap > 1 keeps spans apart") {
    // "p q r s t" at positions 0 and 6: prev span ends at 4, next
    // starts at 6 — covered ranges don't touch, so two spans
    val spans = spansOf(Seq(0L -> "p q r s t m1 p q r s t"))
    assert(spans == Set((0L, 0L, 4L, 1L), (0L, 6L, 10L, 1L)))
  }

  test("touching covered ranges merge into one span") {
    // doc 0 repeats a 10-token run split by nothing: grams at every
    // start 0..5 of the 10-run are duplicated against doc 1 — one span
    val run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val spans = spansOf(Seq(0L -> s"$run y1 y2", 1L -> s"w1 $run"))
    assert(spans == Set((0L, 0L, 9L, 6L), (1L, 1L, 10L, 6L)))
  }

  test("excision drops exactly the covered tokens, order preserved") {
    val df = Seq(0L -> "a b c d e f x1 x2", 1L -> "z1 z2 a b c d e f")
      .toDF("doc_id", "text")
    val covered = DupSpans.coveredPositions(DupSpans.dupStarts(
      DupSpans.gramPositions(df, "doc_id", "text", K)), K)
    val got = covered.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ((0L to 5L).map((0L, _)) ++ (2L to 7L).map((1L, _))).toSet)
  }
}
