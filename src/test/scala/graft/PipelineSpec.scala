package graft

import graft.functions.TextAnalysis._
import graft.ops.ConnectedComponents
import org.apache.spark.sql.functions._

/** Connected-components correctness and the pipeline-op invariants
  * (packing, sampling determinism, n-gram generalization).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, cliques, and separate clusters") {
    // components: {1,2,3,4} (a path — worst-case diameter), {10,11},
    // {20,21,22} (triangle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    // both the adaptive local path (default gate) and the distributed
    // propagation path (gate forced off) must produce the same labels
    for (lt <- Seq(200000L, 0L)) {
      val got = ConnectedComponents.run(edges, "a", "b", localThreshold = lt)
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"localThreshold=$lt")
    }
  }

  test("connected components: min label wins regardless of edge direction") {
    val edges = Seq((9L, 3L), (3L, 7L), (7L, 1L)).toDF("a", "b")
    for (lt <- Seq(200000L, 0L)) {
      val got = ConnectedComponents.run(edges, "a", "b", localThreshold = lt)
        .as[(Long, Long)].collect().toMap
      assert(got.values.toSet === Set(1L), s"localThreshold=$lt")
    }
  }

  test("ngramHashes generalizes shingleHashes (n=3 identical)") {
    val docs = Seq("a b c d e f", "x y", "one two three").toDF("text")
      .select(tokens(col("text")).as("toks"))
    val both = docs.select(
      array_sort(shingleHashes(col("toks"))).as("s3"),
      array_sort(ngramHashes(col("toks"), 3)).as("n3"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (s3, n3) => assert(s3 === n3) }
    // n larger than the doc → empty, not an error
    val n8 = docs.select(size(ngramHashes(col("toks"), 8)).as("n"))
      .as[Int].collect()
    assert(n8.toSeq === Seq(0, 0, 0))
  }

  /** Driver-side union-find reference answer. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> find(n)).toMap
  }

  test("connected components matches union-find on a random graph") {
    // seeded random graph: 120 nodes, 90 edges → a mix of chains,
    // merged clusters, and untouched nodes
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(90)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    for (lt <- Seq(200000L, 0L)) {
      val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b",
          localThreshold = lt)
        .as[(Long, Long)].collect().toMap
      assert(got === ufComponents(edges), s"localThreshold=$lt")
    }
  }

  test("star contraction matches union-find on chains and random graphs") {
    // a 40-node path with shuffled ids (diameter 39 — propagation's
    // worst case, star contraction's home turf) plus a random graph
    val perm = new scala.util.Random(7).shuffle((1L to 40L).toList)
    val chain = perm.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    val rnd = new scala.util.Random(11)
    val rand = Seq.fill(60)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    for (edges <- Seq(chain, rand)) {
      for (lt <- Seq(200000L, 0L)) {
        val got = ConnectedComponents
          .runStarContraction(edges.toDF("a", "b"), "a", "b",
            localThreshold = lt)
          .as[(Long, Long)].collect().toMap
        assert(got === ufComponents(edges), s"localThreshold=$lt")
      }
    }
  }

  test("run() falls back to star contraction past the diameter bound") {
    // diameter 39 >> starFallbackAfter=2: propagation cannot converge,
    // the fallback must still produce the exact answer
    val chain = (1L until 40L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(chain.toDF("a", "b"), "a", "b",
        starFallbackAfter = 2, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 40L).map(_ -> 1L).toMap)
  }

  test("sequence packing: two-level shard sum equals the naive window") {
    // the declared q72 (shard + broadcast offsets) must be value-equal
    // to the straightforward per-language running-sum window it replaces
    val dir = "/root/testdata/sf0.001"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("prev", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        floor(col("prev") / lit(2048)).cast("long").as("seq_id"),
        (col("prev") % 2048).as("seq_offset"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    val sharded = SparkEntry.queries("q72_pack_sequences")(spark, dir)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(sharded === naive)
  }

  test("sequence packing: offsets and ids reconstruct the running sum") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q72_pack_sequences")(spark, dir)
      .select("lang", "doc_id", "n_tokens", "seq_id", "seq_offset")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    rows.foreach { case (_, ds) =>
      var running = 0L
      ds.sortBy(_._2).foreach { case (_, _, n, seqId, off) =>
        assert(seqId === running / 2048)
        assert(off === running % 2048)
        running += n
      }
    }
  }

  test("stratified sample is deterministic and respects per-lang rates") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q71_stratified_sample")
    val a = q(spark, dir).as[(Long, String, String, Long)].collect().toSet
    val b = q(spark, dir).as[(Long, String, String, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
    val maxBucket = Map("en" -> 8000L, "zh" -> 5000L, "de" -> 3000L,
      "fr" -> 2000L).withDefaultValue(1000L)
    a.foreach { case (_, lang, _, bucket) =>
      assert(bucket < maxBucket(lang), s"bucket $bucket over rate for $lang")
    }
  }

  test("repetition filter: looped text fails, diverse text passes") {
    val docs = Seq(
      (1L, Seq.fill(20)("spam").mkString(" "), "en", "s", 99L),
      (2L, (0 until 20).map(i => s"tok$i").mkString(" "), "en", "s", 99L),
      (3L, "ab", "en", "s", 2L)) // shorter than any n-gram → ratio 0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("rep").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q77_repetition_filter")(spark, tmp)
      .select("doc_id", "dup2_ratio", "pass")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 > 0.9 && !got(1L)._2, "all-spam doc must fail")
    assert(got(2L) === ((0.0, true)), "all-distinct doc must pass")
    assert(got(3L) === ((0.0, true)), "sub-n-gram doc is vacuously clean")
  }

  test("embed clusters: pair endpoints co-clustered, one keep per cluster") {
    val dir = "/root/testdata/sf0.001"
    val clusters = SparkEntry.queries("q79_embed_clusters")(spark, dir)
      .select("vec_id", "cluster_id", "keep")
      .as[(Long, Long, Boolean)].collect()
    val byId = clusters.map(c => c._1 -> c._2).toMap
    val pairs = SparkEntry.queries("q29_embed_neardup")(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byId(a) === byId(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._3) === 1, s"cluster $cid keep count")
      assert(members.map(_._1).min === cid, s"cluster $cid id not min")
    }
  }

  test("unigram NLL: rare-token docs score above common-token docs") {
    val docs = Seq(
      (1L, Seq.fill(20)("common").mkString(" "), "en", "s", 99L),
      (2L, (0 until 20).map(i => s"rare$i").mkString(" "), "en", "s", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("nll").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q78_unigram_logprob")(spark, tmp)
      .select("doc_id", "mean_nll").as[(Long, Double)].collect().toMap
    // corpus = 40 tokens: 'common' ×20 (p=.5, nll=ln 2), rare ×1 each
    // (p=1/40, nll=ln 40)
    assert(math.abs(got(1L) - math.log(2)) < 0.002, s"common doc: $got")
    assert(math.abs(got(2L) - math.log(40)) < 0.002, s"rare doc: $got")
    assert(got(2L) > got(1L))
  }

  test("contamination: benchmark docs excluded, planted overlap found") {
    // doc 0 (0 % 31 == 0) is benchmark; doc 1 copies 8+ of its tokens
    // verbatim, doc 2 shares nothing
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight", "en", "s", 50L),
      (1L, "prefix the quick brown fox jumps over the lazy dog tonight suffix", "en", "s", 60L),
      (2L, "completely different words with no shared gram at all here", "en", "s", 55L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("contam").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q70_contamination")(spark, tmp)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(!got.contains(0L), "benchmark docs must not be graded")
    assert(got(1L), "verbatim 8-gram overlap must flag")
    assert(!got(2L), "disjoint doc must not flag")
  }
}
