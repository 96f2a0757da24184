package graft

import graft.functions.TextAnalysis
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The r15 additions: the runner-up MinHash kernel, multi-probe band
  * keys for the near-dup family (candidate superset + recall
  * monotonicity), and the ingest-sink sidecar query's lifecycle.
  */
class Pipeline76Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("minhash2Affine == the HOF second-smallest (multiset " +
    "semantics, single-element degenerates to the min) — the kernel " +
    "is a codegen twin, not a different function") {
    val docs = Tables.documents(spark, dir).limit(60)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        TextAnalysis.shingleHashes(col("toks")).as("hs"))
    val nh = 6
    val ref = (0 until nh).map { j =>
      val (a, b) = TextAnalysis.affineParam(j)
      val l = array_sort(transform(col("hs"),
        h => (h * lit(a) + lit(b)) % lit(TextAnalysis.MinhashPrime)))
      coalesce(element_at(l, 2), element_at(l, 1))
    }
    val bad = docs
      .withColumn("k", TextAnalysis.minhash2Affine(col("hs"), nh))
      .withColumn("r", array(ref: _*))
      .filter(col("k") =!= col("r"))
      .count()
    assert(bad === 0L, "kernel and HOF reference must agree row-for-row")
    // single-shingle doc: runner-up == min
    val one = Seq((1L, Seq(42L))).toDF("doc_id", "hs")
    val row = one
      .select(TextAnalysis.minhashAffine(col("hs"), 3).as("a"),
        TextAnalysis.minhash2Affine(col("hs"), 3).as("b"))
      .collect().head
    assert(row.getAs[scala.collection.Seq[Long]](0).toList ===
      row.getAs[scala.collection.Seq[Long]](1).toList,
      "a single-element input's runner-up is its min")
  }

  test("multiProbeBandKeys: base keys are bandKeyArray's exactly, the " +
    "key count is bands*(1+p), and probe keys differ from base only " +
    "in one slot's runner-up swap") {
    val docs = Tables.documents(spark, dir).limit(40)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        TextAnalysis.shingleHashes(col("toks")).as("hs"))
      .withColumn("mh", TextAnalysis.minhashAffine(col("hs"), 24))
      .withColumn("mh2", TextAnalysis.minhash2Affine(col("hs"), 24))
    val rows = docs.select(col("doc_id"),
        Dedup.bandKeyArray(col("mh"), 8, 3).as("base"),
        Dedup.multiProbeBandKeys(col("mh"), col("mh2"), 8, 3, 2).as("pk"))
      .collect()
    rows.foreach { r =>
      val base = r.getAs[scala.collection.Seq[Long]]("base")
      val pk = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("pk")
      assert(pk.size === 8 * 3, "8 bands x (1 base + 2 probes)")
      (0 until 8).foreach { k =>
        val band = pk.filter(_.getInt(0) == k).map(_.getLong(1))
        assert(band.head === base(k),
          s"band $k's first key must be the base band key")
      }
    }
  }

  test("q389: candidates and verified pairs are MONOTONE in the probe " +
    "level (superset property), level 0 is the plain band join, and " +
    "recall never decreases") {
    val out = SparkEntry.queries("q389_neardup_multiprobe")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    val (c0, v0, r0) = out(0L); val (c1, v1, r1) = out(1L)
    val (c2, v2, r2) = out(2L)
    assert(c0 <= c1 && c1 <= c2,
      s"candidates must be supersets: $c0 <= $c1 <= $c2")
    assert(v0 <= v1 && v1 <= v2, "verified pairs must be supersets")
    assert(r0 <= r1 && r1 <= r2, "recall must not decrease with probes")
  }

  test("q391 (IVF-PQ served) == q89 (inline build) bit-for-bit, " +
    "inline and under an artifact root") {
    def run(name: String): Set[String] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSet
    val want = run("q89_ann_ivfpq")
    assert(run("q391_ann_ivfpq_served") === want,
      "served IVF-PQ must equal the inline build (no root)")
    val root = java.nio.file.Files
      .createTempDirectory("graft-art76").toString
    spark.conf.set(graft.ops.ArtifactStore.RootConf, root)
    try {
      assert(run("q391_ann_ivfpq_served") === want,
        "first served run (builds the codes artifact)")
      assert(run("q391_ann_ivfpq_served") === want,
        "second served run (pure artifact scan)")
      // the scale contract: the served shortlist READS the committed
      // codes artifact and the 8-of-16 cell probe reaches that scan
      // as a PUSHED literal filter (row-group pruning on the
      // cell-clustered layout) — a join-shaped probe could only
      // filter after the read
      val plan = SparkEntry.queries("q391_ann_ivfpq_served")(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("ivfpq_codes"),
        "served q391 must scan the committed codes artifact")
      assert(plan.contains("In(cell") || plan.contains("cell IN"),
        s"the cell probe must push into the codes scan")
    } finally spark.conf.unset(graft.ops.ArtifactStore.RootConf)
  }

  test("q388 runs end to end twice and stays deterministic (the " +
    "lifecycle wipes and rebuilds its own sink)") {
    def run() = SparkEntry.queries("q388_fact_sidecar_served")(spark, dir)
      .collect().map(_.toString).toSet
    val first = run()
    assert(first.nonEmpty)
    assert(run() === first)
  }
}
