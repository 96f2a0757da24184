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
