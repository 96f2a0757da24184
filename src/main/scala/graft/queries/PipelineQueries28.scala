package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis.tokens
import graft.ops.BpeTrainer.adjacentPairs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-eighth pipeline group — long-run event behavior, crawl
  * hygiene, and the vocabulary-size decision curve:
  *
  *  - q244: stationary distribution of the q166 Markov chain — where
  *    user attention settles in the long run, the number session-mix
  *    planners compare against the RAW event mix to find transient-
  *    vs-sticky event types. Twenty synchronous power-iteration steps
  *    in integer micro-units over the |types|²-row transition matrix:
  *    the matrix is a BOUNDED driver collect (the q95 waterfall
  *    precedent), each step's truncating division is replayed
  *    stage-for-stage by the oracle's unrolled CTEs.
  *  - q245: crawl-URL hygiene profile per source — https/tracking-
  *    param/fragment/trailing-slash shares over the raw_docs fixture
  *    URLs (the q183/q184 crawl-frontier family's reporting face).
  *    One scan, one aggregation; string predicates chosen to behave
  *    identically in both engines (contains/prefix, never LIKE with
  *    its `_` wildcard).
  *  - q246: bigram vocabulary coverage curve — corpus token-pair mass
  *    covered by the top-k bigram vocabulary (k = 10/100/1000), the
  *    curve that sizes phrase tables and subword-merge budgets. The
  *    corpus collapses to the vocab-sized count table; the cumulative
  *    rank window runs over those O(vocab) rows only (the q164
  *    histogram-window contract), never the corpus.
  */
object PipelineQueries28 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private val rawDocsPq =
    s"read_parquet('${FixtureGen.FixtureDir}/raw_docs.parquet/*.parquet')"

  /** Power-iteration step count — a plan-time constant, unrolled in
    * the oracle, and PART OF THE OPERATOR'S DEFINITION: each step's
    * truncating divisions leak a few micro of probability mass, so
    * the integer iterate never literally fixes (measured: every
    * component drifts DOWN ~2-4 micro per step past convergence —
    * the price of cross-engine integer determinism). The eigenvector
    * itself settles by ~step 10 on chains this size; 20 is comfortably
    * past that, and both engines replay the identical 20 truncations.
    */
  private val PowerSteps = 20

  val defs: Seq[QDef] = Seq(

    QDef("q244_stationary_distribution",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val tr = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("to_type", lead("event_type", 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        // |types|² rows — bounded by the event-type alphabet. The
        // guard bounds the FETCH (limit before collect, the CC
        // collectIfSmall pattern) — a count-then-collect or a
        // post-collect require would materialize the blowup it
        // guards against
        val cap = 100000
        val edges = tr.limit(cap + 1).collect().map(r =>
          (r.getString(0), r.getString(1), r.getLong(2)))
        require(edges.length <= cap,
          s"transition matrix larger than $cap rows — not driver-safe")
        val nFrom = edges.groupBy(_._1).map { case (f, es) =>
          f -> es.map(_._3).sum }
        val inEdges = edges.groupBy(_._2) // one index, O(edges)/step
        val types = (edges.map(_._1) ++ edges.map(_._2))
          .distinct.sorted
        var pi: Map[String, Long] =
          types.map(_ -> 1000000L / types.size).toMap
        for (_ <- 1 to PowerSteps) {
          val next = types.map { j =>
            j -> inEdges.getOrElse(j, Array.empty[(String, String, Long)])
              .map { case (i, _, n) =>
                (pi.getOrElse(i, 0L) * n) / nFrom(i)
              }.sum
          }.toMap
          pi = next
        }
        types.toSeq.map(t => (t, pi(t))).toDF("event_type", "pi_micro")
      },
      Some {
        val stages = (1 to PowerSteps).map { i =>
          val prev = s"p${i - 1}"
          s"""p$i AS MATERIALIZED (
             |  SELECT c.to_type AS ty,
             |    CAST(sum((p.pi * c.n) // f.n_from) AS BIGINT) AS pi
             |  FROM c JOIN $prev p ON p.ty = c.from_type
             |  JOIN f ON f.from_type = c.from_type
             |  GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH t AS (SELECT event_type,
           |    lead(event_type) OVER (PARTITION BY user_id
           |      ORDER BY ts, event_id) AS to_type
           |  FROM events),
           |c AS MATERIALIZED (SELECT event_type AS from_type, to_type,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
           |f AS MATERIALIZED (SELECT from_type,
           |    CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1),
           |ty AS MATERIALIZED (SELECT from_type AS ty FROM c
           |    UNION SELECT to_type FROM c),
           |nt AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
           |p0 AS MATERIALIZED (SELECT ty, 1000000 // nt.k AS pi
           |    FROM ty CROSS JOIN nt),
           |$stages
           |SELECT ty.ty AS event_type,
           |  CAST(coalesce(pp.pi, 0) AS BIGINT) AS pi_micro
           |FROM ty LEFT JOIN p$PowerSteps pp ON pp.ty = ty.ty"""
          .stripMargin
      }),

    QDef("q245_url_profile",
      (s, _) => {
        val docs = s.read
          .parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")
        docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(lower(col("url")).startsWith("https://").cast("long"))
              .as("nh"),
            sum(col("url").contains("utm_").cast("long")).as("nu"),
            sum(col("url").contains("#").cast("long")).as("nf"),
            sum(col("url").endsWith("/").cast("long")).as("nt"))
          .select(col("source"), col("n_docs"),
            expr("(1000 * nh) div n_docs").as("https_milli"),
            expr("(1000 * nu) div n_docs").as("tracking_milli"),
            expr("(1000 * nf) div n_docs").as("fragment_milli"),
            expr("(1000 * nt) div n_docs").as("trailing_slash_milli"))
      },
      Some(s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST((1000 * sum(CASE WHEN starts_with(lower(url),
              |    'https://') THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
              |    AS https_milli,
              |  CAST((1000 * sum(CASE WHEN contains(url, 'utm_')
              |    THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
              |    AS tracking_milli,
              |  CAST((1000 * sum(CASE WHEN contains(url, '#')
              |    THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
              |    AS fragment_milli,
              |  CAST((1000 * sum(CASE WHEN ends_with(url, '/')
              |    THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
              |    AS trailing_slash_milli
              |FROM $rawDocsPq GROUP BY source""".stripMargin)),

    QDef("q246_vocab_coverage",
      (s, dir) => {
        val bg = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"))
          .select(explode(adjacentPairs(col("toks"))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("n"))
        // rank + cumulative over the VOCAB-sized frame only
        val w = Window.orderBy(col("n").desc, col("pair"))
        val ranked = bg
          .withColumn("rk", row_number().over(w))
          .withColumn("cum", sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .localCheckpoint() // total + three k probes read it
        val tot = ranked.agg(sum("n").as("total"),
          count(lit(1)).as("vocab"))
        Seq(10L, 100L, 1000L).map { k =>
          ranked.filter(col("rk") <= k)
            .agg(max("cum").as("covered"))
            .crossJoin(broadcast(tot))
            .select(lit(k).as("k"),
              coalesce(col("covered"), lit(0L)).as("covered"),
              col("total"), col("vocab"),
              expr("(1000 * coalesce(covered, 0L)) div total")
                .as("coverage_milli"))
        }.reduce(_ unionAll _)
      },
      Some {
        val pairSql = "list_transform(generate_series(1, len(toks) - 1), " +
          "i -> toks[i] || ' ' || toks[i+1])"
        val ks = Seq(10, 100, 1000).map { k =>
          s"""SELECT CAST($k AS BIGINT) AS k,
             |  coalesce((SELECT max(cum) FROM r WHERE rk <= $k), 0)
             |    AS covered,
             |  tot.total, tot.vocab,
             |  CAST((1000 * coalesce((SELECT max(cum) FROM r
             |    WHERE rk <= $k), 0)) // tot.total AS BIGINT)
             |    AS coverage_milli
             |FROM tot""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
           |bg AS MATERIALIZED (SELECT pair, CAST(count(*) AS BIGINT) AS n
           |  FROM (SELECT unnest($pairSql) AS pair FROM t
           |        WHERE len(toks) >= 2) x
           |  GROUP BY pair),
           |r AS MATERIALIZED (SELECT pair, n,
           |    row_number() OVER (ORDER BY n DESC, pair) AS rk,
           |    sum(n) OVER (ORDER BY n DESC, pair
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cum
           |  FROM bg),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
           |    CAST(count(*) AS BIGINT) AS vocab FROM bg)
           |SELECT k, CAST(covered AS BIGINT) AS covered, total, vocab,
           |  coverage_milli
           |FROM ($ks)""".stripMargin
      }),

    // Epoch schedule under the q232 reweighting: for token budgets of
    // 1×/2×/4× the corpus, how many times does each source's data get
    // seen (epochs, in milli)? target_i = budget · weight_i; epochs_i
    // = target_i / mass_i — the table that turns mixture weights into
    // an actual training plan and shows where up-weighting becomes
    // many-epoch repetition (the data-repetition risk DoReMi-style
    // reweighting must be checked against). Reuses q232's QDef fn and
    // oracle SQL verbatim (the q219 nesting pattern) so the schedule
    // can never drift from the weights; source token masses are one
    // aggregation of the token stream.
    QDef("q247_epoch_schedule",
      (s, dir) => {
        val weights = PipelineQueries26.defs
          .find(_.name == "q232_domain_reweight").get.fn(s, dir)
          .select(col("source"), col("weight_milli"))
          .localCheckpoint() // three budget rows read it
        val mass = Tables.documents(s, dir)
          .select(col("source"), tokens(col("text")).as("toks"))
          .select(col("source"), size(col("toks")).cast("long").as("nt"))
          .groupBy("source").agg(sum("nt").as("mass"))
        val tot = mass.agg(sum("mass").as("total"))
        val base = weights.join(broadcast(mass), "source")
          .crossJoin(broadcast(tot))
        Seq(1L, 2L, 4L).map { m =>
          base.select(lit(m).as("budget_x"), col("source"),
            col("mass"),
            expr(s"($m * total * weight_milli) div 1000").as("target"),
            expr(s"(1000 * (($m * total * weight_milli) div 1000)) " +
              "div mass").as("epochs_milli"))
        }.reduce(_ unionAll _)
      },
      Some {
        val q232Sql = PipelineQueries26.defs
          .find(_.name == "q232_domain_reweight").get.oracle.get
        val budgets = Seq(1, 2, 4).map { m =>
          s"""SELECT CAST($m AS BIGINT) AS budget_x, w.source, ms.mass,
             |  ($m * tt.total * w.weight_milli) // 1000 AS target,
             |  (1000 * (($m * tt.total * w.weight_milli) // 1000))
             |    // ms.mass AS epochs_milli
             |FROM w JOIN ms USING (source) CROSS JOIN tt""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH w AS MATERIALIZED (
           |  SELECT source, weight_milli FROM ($q232Sql)),
           |tk AS (SELECT source, CAST(len($toksSql) AS BIGINT) AS nt
           |       FROM documents),
           |ms AS MATERIALIZED (SELECT source,
           |    CAST(sum(nt) AS BIGINT) AS mass FROM tk GROUP BY 1),
           |tt AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM ms)
           |SELECT budget_x, source, mass, CAST(target AS BIGINT)
           |    AS target,
           |  CAST(epochs_milli AS BIGINT) AS epochs_milli
           |FROM ($budgets)""".stripMargin
      }),

    // Are duplicates junk? Quality-gate pass rate by near-dup cluster
    // size (buckets 1 / 2 / 3 / 4 / 5+): if replicated content
    // passes the q74 gate at a much lower rate, dedup and quality
    // filtering overlap and the pipeline can cheapen one of them —
    // if not, they prune DIFFERENT mass and both must run. Composes
    // verified machinery: q25 pairs → CC labels (cluster sizes) left-
    // joined at the doc level, the q74 gate computed in the same
    // scan; strata are O(1) rows.
    QDef("q248_dup_quality",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("toks", tokens(col("text")))
          .withColumn("pass", graft.ops.QualityGates.heuristicPass(
            col("text"), col("n_chars"), col("toks"))
            .cast("long"))
          .select(col("doc_id"), col("pass"))
        val pairs = graft.ops.Dedup
          .nearDupMinhashArtifact(Tables.documents(s, dir), "doc_id",
            "text", fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"))
        val comp = graft.ops.ConnectedComponents
          .run(pairs, "doc_a", "doc_b")
        val sizes = comp.groupBy("component")
          .agg(count(lit(1)).as("csize"))
        val docSize = comp.join(broadcast(sizes), "component")
          .select(col("node").as("doc_id"), col("csize"))
        docs.join(broadcast(docSize), Seq("doc_id"), "left")
          .select(col("pass"),
            least(coalesce(col("csize"), lit(1L)), lit(5L))
              .as("size_bucket"))
          .groupBy("size_bucket")
          .agg(count(lit(1)).as("n_docs"), sum("pass").as("n_pass"))
          .select(col("size_bucket"), col("n_docs"), col("n_pass"),
            expr("(1000 * n_pass) div n_docs").as("pass_milli"))
      },
      Some {
        s"""WITH RECURSIVE ${PipelineQueries.pairCtes(0.8, materialized = true)},
           |e AS (SELECT da AS a, db AS b FROM pr
           |      UNION SELECT db, da FROM pr),
           |reach(a, b) AS (
           |  SELECT a, b FROM e
           |  UNION
           |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
           |cl AS (SELECT a AS node, least(a, min(b)) AS component
           |       FROM reach GROUP BY a),
           |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS csize
           |       FROM cl GROUP BY 1),
           |ds AS (SELECT cl.node AS doc_id, sz.csize
           |       FROM cl JOIN sz USING (component)),
           |${PipelineQueries.gateMetricsCte},
           |g AS (SELECT doc_id,
           |    CASE WHEN ${PipelineQueries.gatePassSql} THEN 1 ELSE 0
           |    END AS pass FROM gm),
           |j AS (SELECT least(coalesce(ds.csize, 1), 5) AS size_bucket,
           |    g.pass
           |  FROM g LEFT JOIN ds USING (doc_id))
           |SELECT CAST(size_bucket AS BIGINT) AS size_bucket,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(pass) AS BIGINT) AS n_pass,
           |  CAST((1000 * CAST(sum(pass) AS BIGINT)) // count(*)
           |    AS BIGINT) AS pass_milli
           |FROM j GROUP BY 1""".stripMargin
      }),

    // Cohort conversion: the q217 ordered funnel completion rate per
    // first-seen-day cohort — "are newer cohorts converting better?",
    // the product question q218's retention matrix doesn't answer.
    // One per-user window pass computes both the cohort day and the
    // ordered-stage booleans; output is O(#days) rows.
    QDef("q249_cohort_conversion",
      (s, dir) => {
        PipelineQueries24.funnelStaged(s, dir).groupBy("user_id")
          .agg(expr("min(tus) div 86400000000").as("cohort_day"),
            max(when(col("pav").isNotNull, 1L).otherwise(0L))
              .as("converted"))
          .groupBy("cohort_day")
          .agg(count(lit(1)).as("n_users"),
            sum("converted").as("n_converted"))
          .select(col("cohort_day"), col("n_users"), col("n_converted"),
            expr("(1000 * n_converted) div n_users").as("conv_milli"))
      },
      Some(s"""WITH ${PipelineQueries24.funnelCtes},
             |u AS (SELECT user_id, min(tus) // 86400000000 AS cohort_day,
             |    max(CASE WHEN pav IS NOT NULL THEN 1 ELSE 0 END)
             |      AS converted
             |  FROM p4 GROUP BY user_id)
             |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(converted) AS BIGINT) AS n_converted,
             |  CAST((1000 * CAST(sum(converted) AS BIGINT)) // count(*)
             |    AS BIGINT) AS conv_milli
             |FROM u GROUP BY cohort_day""".stripMargin))
  )
}
