package graft

import graft.ops.ArtifactStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import java.nio.file.Files

/** The r14 artifact extensions to the decon + LM-scoring families:
  * the served twins return BIT-IDENTICAL rows to their inline
  * builders, their plans read the committed artifacts, and the
  * no-root fallback keeps the historical inline shape.
  */
class Pipeline75Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Set[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSet

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def withFreshRoot[A](f: String => A): A = {
    val root = Files.createTempDirectory("graft-art75").toString
    spark.conf.set(ArtifactStore.RootConf, root)
    ArtifactStore.clearFingerprintMemo()
    try f(root) finally spark.conf.unset(ArtifactStore.RootConf)
  }

  private def committed(root: String, name: String): Boolean = {
    val d = java.nio.file.Paths.get(s"$root/$name")
    Files.isDirectory(d) && {
      val s = Files.walk(d)
      try s.anyMatch(p => p.getFileName.toString == "manifest.json")
      finally s.close()
    }
  }

  test("q381 == q93 and q382 == q108 bit-for-bit, inline (no root)") {
    assert(run("q381_winnow_decon_served") ===
      run("q93_winnow_contamination"),
      "the served decon twin must equal the inline probe")
    assert(run("q382_bigram_nll_served") === run("q108_bigram_nll"),
      "the served LM twin must equal the inline scorer")
  }

  test("under a cold root: q92 commits the winnow_fps artifact, " +
    "q381 serves it (twin equality holds), and q382 commits + reads " +
    "the bigram count tables") {
    withFreshRoot { root =>
      val inline93 = run("q93_winnow_contamination") // never artifact-routed
      run("q92_winnow_fingerprints") // the build query: commits the index
      assert(committed(root, "winnow_fps"),
        "q92 must commit the corpus winnow index")
      assert(run("q381_winnow_decon_served") === inline93,
        "q381 must serve q93's answer from the committed index")
      val p381 = plan("q381_winnow_decon_served")
      assert(p381.contains("winnow_fps"),
        s"q381's plan must scan the winnow_fps artifact:\n$p381")

      val inline108 = run("q108_bigram_nll")
      assert(run("q382_bigram_nll_served") === inline108,
        "q382 must serve q108's answer from the committed tables")
      assert(committed(root, "bigram_lm_c2") &&
        committed(root, "bigram_lm_c1"),
        "q382 must commit both count tables")
      val p382 = plan("q382_bigram_nll_served")
      assert(p382.contains("bigram_lm_c2") && p382.contains("bigram_lm_c1"),
        s"q382's plan must scan the committed count tables:\n$p382")
    }
  }

  test("q92's artifact routing is row-invariant: served rows == the " +
    "inline winnow stream") {
    val inline = run("q92_winnow_fingerprints") // no root: inline shape
    withFreshRoot { _ =>
      assert(run("q92_winnow_fingerprints") === inline,
        "build-and-serve must return the inline rows")
      assert(run("q92_winnow_fingerprints") === inline,
        "a second call (pure serve) must return the same rows")
    }
  }

  test("q385 scores the unigram LM from the MAINTAINED count store " +
    "== q78's single-shot answer") {
    assert(run("q385_unigram_maintained_served") ===
      run("q78_unigram_logprob"),
      "the maintained-store LM must equal the inline scorer")
  }

  test("q384 serves the decon answer from the MAINTAINED index " +
    "(arrivals + mid-life compaction + append) == q93, inline and " +
    "under a root") {
    val want = run("q93_winnow_contamination")
    assert(run("q384_decon_maintained_served") === want,
      "maintained-index decon must equal the single-shot probe (inline)")
    withFreshRoot { _ =>
      assert(run("q384_decon_maintained_served") === want,
        "maintained-index decon must equal the single-shot probe (served)")
    }
  }

  test("q387's serve log records the exact lifecycle: build, " +
    "serve-hit, variant build, rebuild + sibling vacuum, serve-hit") {
    val rows = SparkEntry.queries("q387_artifact_serve_log")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ===
      Seq("build", "serve", "build", "build", "vacuum", "serve"),
      s"unexpected event sequence: ${rows.toSeq}")
    // the vacuum names the superseded content address (fpA), which is
    // the address the first build committed
    val byId = SparkEntry.queries("q387_artifact_serve_log")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(byId(5L) === byId(1L),
      "the vacuumed fingerprint must be the first build's address")
    assert(byId(4L) !== byId(1L),
      "the rebuild must carry the NEW corpus address")
  }

  test("q386 answers the multi-probe query from the MAINTAINED LSH " +
    "index == q376, inline and under a root") {
    val want = run("q376_ann_lsh_multiprobe")
    assert(run("q386_multiprobe_maintained_served") === want,
      "maintained-index multi-probe must equal the single-shot answer")
    withFreshRoot { _ =>
      assert(run("q386_multiprobe_maintained_served") === want,
        "maintained-index multi-probe must equal it when served")
    }
  }
}
