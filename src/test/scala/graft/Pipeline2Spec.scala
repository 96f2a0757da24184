package graft

import graft.queries.PipelineQueries2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic pins for the raw_docs cleaning operators (q80-q82) beyond
  * the DuckDB hash gate: invariants that must hold on ANY corpus, not
  * just value equality on this fixture.
  */
class Pipeline2Spec extends SparkSpec {

  private def run(name: String): DataFrame =
    PipelineQueries2.defs.find(_.name == name).get.fn(spark, "")

  test("q80: redacted text carries no residual matches of any category") {
    val out = run("q80_pii_redact")
    val residual = out.filter(
      regexp_count(col("redacted"),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")) > 0 ||
      regexp_count(col("redacted"),
        lit("\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b")) > 0 ||
      regexp_count(col("redacted"), lit("https?://[A-Za-z0-9./_?=&-]+")) > 0)
      .count()
    assert(residual == 0)
    // the fixture plants every category, so the counts must be non-trivial
    val sums = out.agg(sum("n_emails"), sum("n_phones"), sum("n_ips"),
      sum("n_urls")).head()
    (0 until 4).foreach(i => assert(sums.getLong(i) > 0))
  }

  test("q81: kept paragraphs == distinct paragraphs, first occurrence wins") {
    val out = run("q81_para_dedup")
    val raw = spark.read.parquet(
      s"${graft.fixtures.FixtureGen.FixtureDir}/raw_docs.parquet")
    val paras = raw.select(col("doc_id"),
      posexplode(split(col("text"), lit("\n\n"))).as(Seq("pos", "para")))
    val distinctParas = paras.select("para").distinct().count()
    val keptTotal = out.agg(sum("n_kept")).head().getLong(0)
    assert(keptTotal == distinctParas)
    // no document gains paragraphs, totals are preserved
    assert(out.filter(col("n_kept") > col("n_paras")).count() == 0)
    assert(out.agg(sum("n_paras")).head().getLong(0) == paras.count())
    // the global first occurrence (min doc_id among carriers) keeps it
    val firstDoc = paras.groupBy("para").agg(min("doc_id").as("d0"))
      .select(col("d0")).distinct()
    val keepers = out.filter(col("n_kept") > 0).select(col("doc_id"))
    assert(firstDoc.join(keepers, col("d0") === col("doc_id"), "left_anti")
      .count() == 0)
  }

  test("q83: smallest language keeps everything, rates fall with size") {
    val out = PipelineQueries2.defs.find(_.name == "q83_temperature_resample")
      .get.fn(spark, "/root/testdata/sf0.001")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = out.select("lang", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy(_._2)._1
    assert(rates(minLang) == 1000000L) // sqrt(n_min/n_min) = 1
    // monotone: bigger language -> lower (or equal) rate
    val ordered = rates.toSeq.sortBy { case (l, _) => counts(l) }.map(_._2)
    assert(ordered == ordered.sorted.reverse)
    // kept fraction per language is within 5 ppt of its rate
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (l, ppm) =>
      val frac = kept.getOrElse(l, 0L).toDouble / counts(l)
      assert(math.abs(frac - ppm / 1e6) < 0.15, s"$l: $frac vs ${ppm / 1e6}")
    }
  }

  test("q84: two-level prefix sum equals the naive per-source window") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val out = PipelineQueries2.defs.find(_.name == "q84_token_budget_mix")
      .get.fn(spark, dir)
    val h = graft.functions.TextAnalysis.tokenHash(
      concat(lit("mix:"), col("doc_id").cast("string")))
    val naive = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tokens"), h.as("h"))
      .withColumn("prev_tokens", coalesce(sum("n_tokens").over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("prev_tokens") < 400)
      .select("doc_id", "source", "n_tokens", "prev_tokens")
    val a = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val b = naive.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // every source's selection is a prefix: max prev < budget, and the
    // selection is non-empty for every source present in the corpus
    val srcs = Tables.documents(spark, dir).select("source").distinct().count()
    assert(out.select("source").distinct().count() == srcs)
  }

  test("q82: blocked counts are bounded by url counts and flag correctly") {
    val out = run("q82_domain_filter")
    assert(out.filter(col("n_blocked") > col("n_urls")).count() == 0)
    assert(out.filter(col("pass") =!= (col("n_blocked") === 0)).count() == 0)
    // fixture plants blocked domains (site3/site7/blog-2 appear in pool)
    assert(out.filter(!col("pass")).count() > 0)
    // every reported blocked doc actually lists a blocklisted domain
    val bad = out.filter(col("n_blocked") > 0)
      .filter(!col("domains").contains("site3.example.com") &&
        !col("domains").contains("site7.example.com") &&
        !col("domains").contains("blog-2.test.org"))
    assert(bad.count() == 0)
  }
}
