package graft

/** Invariants for the graph-structure / composition groups
  * (q290-q293). */
class Pipeline38Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q290: assortativity is a correlation (|r| <= 1) over a " +
    "symmetric edge list") {
    val Array((m, nodes, meanDeg, r)) =
      SparkEntry.queries("q290_degree_assortativity")(spark, dir)
        .as[(Long, Long, Long, Long)].collect()
    assert(m > 0 && m % 2 === 0, "directed edge count must be even")
    assert(nodes > 0 && meanDeg > 0)
    assert(r >= -1000 && r <= 1000, s"assortativity $r out of [-1, 1]")
  }

  test("q291: vocabulary Jaccard is bounded and intersections never " +
    "exceed either vocabulary") {
    val rows = SparkEntry.queries("q291_source_vocab_overlap")(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, inter, va, vb, j) =>
      assert(a < b, "pairs must be canonically ordered")
      assert(inter <= math.min(va, vb), s"($a,$b) inter > min vocab")
      assert(j >= 0 && j <= 1000, s"($a,$b) jaccard $j out of range")
    }
  }

  test("q292: affinity covers every source pair exactly once and " +
    "cross-near-dup counts are consistent with q291's pair space") {
    val rows = SparkEntry.queries("q292_source_affinity")(spark, dir)
      .as[(String, String, Long, Long)].collect()
    val sources = Tables.documents(spark, dir)
      .select("source").distinct().count()
    assert(rows.length.toLong === sources * (sources - 1) / 2)
    rows.foreach { case (a, b, j, nd) =>
      assert(a < b)
      assert(j >= 0 && j <= 1000)
      assert(nd >= 0)
    }
  }

  test("q293: nDCG/MRR are bounded, and full overlap at 10 is " +
    "exactly nDCG == 1 under binary relevance") {
    val rows = SparkEntry.queries("q293_ann_ndcg")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nRel, ndcg, mrr) =>
      assert(nRel >= 0 && nRel <= 10, s"q$qid n_rel10 $nRel")
      assert(ndcg >= 0 && ndcg <= 1000000, s"q$qid ndcg $ndcg")
      assert(mrr >= 0 && mrr <= 1000000, s"q$qid mrr $mrr")
      if (nRel == 10)
        assert(ndcg === 1000000L,
          s"q$qid: all-relevant top-10 must be perfect nDCG")
      if (nRel > 0) assert(mrr > 0)
    }
  }
}
