package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.ops.{LabelProp, Sketches, TopK}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-third pipeline group — community structure, local graph
  * density, and per-group sketch quantiles:
  *
  *  - q214: label-propagation communities over the q129 co-citation
  *    graph ([[graft.ops.LabelProp]]) — the community complement to
  *    connectivity (q69), PageRank (q129) and HITS (q211): syndicate
  *    clusters in the domain graph become shared labels after 3
  *    synchronous rounds. Deterministic tie-break ((−count, label)
  *    struct-min) replaces classic LPA's random choice; the plan is
  *    cardinality-gated exactly like q129.
  *  - q215: triangle counts + local clustering coefficients on the
  *    same graph, via DEGREE-ORDERED edge orientation (each edge
  *    charged to its lower-(degree, name) endpoint, the standard
  *    scalable construction): wedges enumerate per ORIENTED out-
  *    neighborhood — bounded by out-degree², which the orientation
  *    keeps near √m per node — and close with a semi join back on the
  *    oriented edge set. Never neighbors×neighbors on hub nodes.
  *  - q216: per-language bottom-K quantile sketches — q210's
  *    mergeable sample generalized to grouped state (K = 64 per
  *    language): per-group sketch vs per-group EXACT histogram
  *    quantiles at p ∈ {.25, .5, .9}. The realistic shape for "length
  *    distribution per language" dashboards at corpus scale: O(K) per
  *    group, partial/final TopK, windows only over sample rows and
  *    value histograms.
  *
  * Determinism: all integer arithmetic; struct orders are total
  * (counts negate into the struct, names break ties); ceil-rank
  * quantile definitions match both engines bit-for-bit.
  */
object PipelineQueries23 {

  private def rawPq =
    s"read_parquet('${FixtureGen.FixtureDir}/raw_docs.parquet/*.parquet')"

  private def rawDocs(s: SparkSession): DataFrame =
    s.read.parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")

  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  /** q129's co-citation graph: nodes + both-direction distinct edges. */
  private def cocitation(s: SparkSession): (DataFrame, DataFrame) = {
    val perDoc = rawDocs(s)
      .select(col("doc_id"),
        array_distinct(regexp_extract_all(col("text"),
          lit("https?://([a-z0-9.-]+)/"), lit(1))).as("ds"))
      .filter(size(col("ds")) > 0)
      .localCheckpoint() // nodes + edges both read it
    val nodes = perDoc.select(explode(col("ds")).as("domain")).distinct()
    val edges = perDoc
      .select(explode(col("ds")).as("src"), col("ds"))
      .select(col("src"), explode(col("ds")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    (nodes, edges)
  }

  private val graphCtes =
    s"""dd AS (SELECT DISTINCT doc_id, domain FROM (
       |  SELECT doc_id, unnest(regexp_extract_all(text,
       |    'https?://([a-z0-9.-]+)/', 1)) AS domain FROM $rawPq)),
       |n AS (SELECT DISTINCT domain FROM dd),
       |e AS MATERIALIZED (SELECT DISTINCT a.domain AS src,
       |    b.domain AS dst
       |  FROM dd a JOIN dd b USING (doc_id)
       |  WHERE a.domain <> b.domain)""".stripMargin

  val defs: Seq[QDef] = Seq(

    QDef("q214_domain_communities",
      (s, _) => {
        val (nodes, edges) = cocitation(s)
        val labels = LabelProp.communities(nodes, edges, iters = 3)
        val sizes = labels.groupBy("label")
          .agg(count(lit(1)).as("csize"))
        // post-checkpoint stats are unknown → Catalyst would SMJ;
        // hash join without the sort (community count ≤ #nodes)
        labels.join(sizes.hint("shuffle_hash"), "label")
          .select(col("domain"), col("label"), col("csize"))
      },
      Some {
        val rounds = (1 to 3).map { i =>
          s"""c$i AS (SELECT e.src AS domain, l${i - 1}.label,
             |    count(*) AS cnt
             |  FROM e JOIN l${i - 1} ON e.dst = l${i - 1}.domain
             |  GROUP BY 1, 2),
             |m$i AS (SELECT domain, struct_extract(
             |    min({'nc': -cnt, 'l': label}), 'l') AS nl
             |  FROM c$i GROUP BY 1),
             |l$i AS MATERIALIZED (SELECT n.domain,
             |    coalesce(m$i.nl, n.domain) AS label
             |  FROM n LEFT JOIN m$i USING (domain))""".stripMargin
        }.mkString(",\n")
        s"""WITH $graphCtes,
           |l0 AS MATERIALIZED (SELECT domain, domain AS label FROM n),
           |$rounds,
           |cs AS (SELECT label, count(*) AS csize FROM l3 GROUP BY 1)
           |SELECT l3.domain, l3.label, CAST(csize AS BIGINT) AS csize
           |FROM l3 JOIN cs USING (label)""".stripMargin
      }),

    QDef("q215_domain_triangles",
      (s, _) => {
        val (nodes, edges) = cocitation(s)
        graft.ops.Triangles.perDomain(nodes, edges)
      },
      Some(s"""WITH $graphCtes,
              |d AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
              |o AS MATERIALIZED (SELECT e.src AS u, e.dst AS v,
              |    d2.d AS dv
              |  FROM e JOIN d ON e.src = d.src
              |         JOIN d d2 ON e.dst = d2.src
              |  WHERE {'d': d.d, 'n': e.src} < {'d': d2.d, 'n': e.dst}),
              |w AS (SELECT o1.u, o1.v AS b, o1.dv AS db,
              |    o2.v AS c, o2.dv AS dc
              |  FROM o o1 JOIN o o2 ON o1.u = o2.u
              |  WHERE {'d': o1.dv, 'n': o1.v} < {'d': o2.dv, 'n': o2.v}),
              |tr AS MATERIALIZED (SELECT w.u, w.b, w.c FROM w
              |  WHERE EXISTS (SELECT 1 FROM o
              |    WHERE o.u = w.b AND o.v = w.c)),
              |tc AS (SELECT domain, count(*) AS t FROM (
              |  SELECT u AS domain FROM tr
              |  UNION ALL SELECT b FROM tr
              |  UNION ALL SELECT c FROM tr) z GROUP BY 1)
              |SELECT n.domain, CAST(coalesce(d.d, 0) AS BIGINT) AS deg,
              |  CAST(coalesce(tc.t, 0) AS BIGINT) AS n_tri,
              |  CAST(CASE WHEN coalesce(d.d, 0) >= 2 THEN
              |      (2000 * coalesce(tc.t, 0)) // (d.d * (d.d - 1))
              |    ELSE 0 END AS BIGINT) AS cc_milli
              |FROM n LEFT JOIN d ON n.domain = d.src
              |       LEFT JOIN tc USING (domain)""".stripMargin)),

    QDef("q216_lang_quantiles",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("lang"), col("doc_id"), col("n_chars"),
            Sketches.hash60(concat(lit("lq:"),
              col("doc_id").cast("string"))).as("h"))
          .localCheckpoint() // exact histograms + sample share the scan
        val sample = TopK.perGroup(docs, "lang",
            struct(col("h"), col("doc_id"), col("n_chars")), 64)
          .select(col("lang"), col("key.n_chars").as("v"),
            col("key.doc_id").as("d"))
          .localCheckpoint() // rank + per-group count share it
        val kc = sample.groupBy("lang").agg(count(lit(1)).as("kk"))
        val sv = sample.withColumn("rv", row_number().over(
          Window.partitionBy("lang").orderBy(col("v"), col("d"))))
        val ps = typedLit(Seq(250L, 500L, 900L))
        val sq = sv.join(broadcast(kc), "lang")
          .select(col("lang"), explode(ps).as("p"), col("rv"), col("v"),
            col("kk"))
          .filter(col("rv") === expr("(p * kk + 999) div 1000"))
          .select(col("lang"), col("p"), col("v").as("sample_v"))
        val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        val ex = docs.groupBy("lang", "n_chars")
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(Window.partitionBy("lang")
            .orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .join(broadcast(nl), "lang") // O(distinct values) per lang
          .select(col("lang"), explode(ps).as("p"), col("n_chars"),
            col("cum"), col("n"))
          .filter(col("cum") >= expr("(p * n + 999) div 1000"))
          .groupBy("lang", "p").agg(min("n_chars").as("exact_v"))
        ex.join(sq, Seq("lang", "p"))
          .select(col("lang"), col("p").as("p_milli"), col("exact_v"),
            col("sample_v"),
            (col("sample_v") - col("exact_v")).as("err"))
      },
      Some(s"""WITH d AS (SELECT lang, doc_id, n_chars,
              |    ${hash60Sql("'lq:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |s AS MATERIALIZED (SELECT lang, doc_id, n_chars FROM (
              |    SELECT lang, doc_id, n_chars, row_number() OVER (
              |      PARTITION BY lang ORDER BY h, doc_id) AS rk FROM d) z
              |  WHERE rk <= 64),
              |k AS (SELECT lang, count(*) AS kk FROM s GROUP BY 1),
              |sv AS (SELECT lang, n_chars AS v, row_number() OVER (
              |    PARTITION BY lang ORDER BY n_chars, doc_id) AS rv
              |  FROM s),
              |ps AS (SELECT unnest([250, 500, 900]) AS p),
              |sq AS (SELECT sv.lang, ps.p, sv.v AS sample_v
              |  FROM sv JOIN k USING (lang), ps
              |  WHERE sv.rv = (ps.p * k.kk + 999) // 1000),
              |h AS (SELECT lang, n_chars, count(*) AS c FROM d
              |  GROUP BY 1, 2),
              |ch AS (SELECT lang, n_chars, sum(c) OVER (
              |    PARTITION BY lang ORDER BY n_chars) AS cum FROM h),
              |nl AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
              |ex AS (SELECT ch.lang, ps.p, min(ch.n_chars) AS exact_v
              |  FROM ch JOIN nl USING (lang), ps
              |  WHERE ch.cum >= (ps.p * nl.n + 999) // 1000
              |  GROUP BY 1, 2)
              |SELECT ex.lang, CAST(ex.p AS BIGINT) AS p_milli,
              |  CAST(exact_v AS BIGINT) AS exact_v,
              |  CAST(sample_v AS BIGINT) AS sample_v,
              |  CAST(sample_v - exact_v AS BIGINT) AS err
              |FROM ex JOIN sq ON ex.lang = sq.lang AND ex.p = sq.p"""
        .stripMargin))
  )
}
