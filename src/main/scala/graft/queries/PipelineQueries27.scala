package graft.queries

import graft.Tables
import graft.functions.TextAnalysis.{affineParam, shingleHashes, tokens, MinhashPrime}
import graft.ops.{ConnectedComponents, Dedup, Sketches}
import org.apache.spark.sql.functions._

/** Twenty-seventh pipeline group — dedup-graph topology, event
  * anomaly detection, and the LSH geometry decision table:
  *
  *  - q234: component topology of the near-dup graph — per
  *    component-size stratum, how many components are CLIQUES
  *    (pairwise-complete: re-crawl families) vs chains/sparse blobs
  *    (transitive similarity: template drift). PLANS.md records the
  *    clique-vs-chain distinction qualitatively (q69 cliques vs q79
  *    chains); this is the number. Integer density in milli of the
  *    complete graph.
  *  - q235: hourly burst screen — hours whose event count exceeds
  *    mean + 3σ, decided ENTIRELY in integers by squaring the
  *    z-condition ((n·H − S)² > 9·(H·SS − S²) with n·H − S > 0), so
  *    no sqrt enters the cross-engine gate. Emits the top-5 excess
  *    hours with the burst flag — informative even when nothing
  *    bursts. Corpus collapses to O(#hours) in one aggregation (the
  *    q146 shape).
  *  - q236: MinHash-LSH (bands × rows) geometry sweep — candidate
  *    volume, verified pairs, precision, and recall vs the EXACT
  *    full-recall pair set (the q66 prefix join, not a probabilistic
  *    reference) for the practical 24-hash splits (12×2, 8×3, 6×4).
  *    One signature table feeds every geometry (tagged band-key
  *    union, one verify pass over the distinct candidate pairs);
  *    this is the table that picks (b, r) for a corpus-wide dedup
  *    run — steeper r trades recall for candidate volume, and the
  *    sweep prices that trade on the corpus itself. The degenerate
  *    24×1 split is deliberately absent: measuring ITS precision
  *    means exact-verifying the single-hash collision flood — the
  *    exact join banding exists to avoid (measured here: ~4× the
  *    whole sweep's runtime; candidate volume is q205's stop-shingle
  *    story). Oracle replays every band-candidate set component-wise
  *    (the q140 lesson) and the exhaustive truth.
  */
object PipelineQueries27 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private val Geometries = Seq((12, 2), (8, 3), (6, 4))

  val defs: Seq[QDef] = Seq(

    QDef("q234_component_topology",
      (s, dir) => {
        val pairs = Dedup
          .nearDupMinhashArtifact(Tables.documents(s, dir), "doc_id",
            "text", fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"))
          .localCheckpoint() // CC + edge attribution read it
        val comp = ConnectedComponents.run(pairs, "doc_a", "doc_b")
        val sizes = comp.groupBy("component")
          .agg(count(lit(1)).as("n_nodes"))
        val edges = pairs
          .join(comp.withColumnRenamed("node", "doc_a"), "doc_a")
          .groupBy("component").agg(count(lit(1)).as("n_edges"))
        sizes.join(edges, "component")
          .withColumn("density_milli",
            expr("(2000 * n_edges) div (n_nodes * (n_nodes - 1))"))
          .withColumn("is_clique",
            expr("n_edges = (n_nodes * (n_nodes - 1)) div 2"))
          .groupBy("n_nodes")
          .agg(count(lit(1)).as("n_components"),
            sum(col("is_clique").cast("long")).as("n_cliques"),
            sum(col("density_milli")).as("sd"))
          .select(col("n_nodes"), col("n_components"), col("n_cliques"),
            expr("sd div n_components").as("mean_density_milli"))
      },
      Some(s"""WITH RECURSIVE ${PipelineQueries.pairCtes(0.8, materialized = true)},
              |e AS (SELECT da AS a, db AS b FROM pr
              |      UNION SELECT db, da FROM pr),
              |reach(a, b) AS (
              |  SELECT a, b FROM e
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
              |cl AS (SELECT a AS node, least(a, min(b)) AS component
              |       FROM reach GROUP BY a),
              |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
              |       FROM cl GROUP BY 1),
              |ed AS (SELECT cl.component, CAST(count(*) AS BIGINT)
              |         AS n_edges
              |       FROM pr JOIN cl ON pr.da = cl.node GROUP BY 1),
              |per AS (SELECT sz.component, n_nodes, n_edges,
              |    (2000 * n_edges) // (n_nodes * (n_nodes - 1)) AS dens,
              |    n_edges = (n_nodes * (n_nodes - 1)) // 2 AS iscl
              |  FROM sz JOIN ed USING (component))
              |SELECT n_nodes, CAST(count(*) AS BIGINT) AS n_components,
              |  CAST(sum(CASE WHEN iscl THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_cliques,
              |  CAST(CAST(sum(dens) AS BIGINT) // count(*) AS BIGINT)
              |    AS mean_density_milli
              |FROM per GROUP BY n_nodes""".stripMargin)),

    // Overflow bound: the squared z-condition needs |n·H − S| < 3e9
    // (and H·SS < 9.2e18). At web-event scale (1e9 events/hour) counts
    // must be rescaled (e.g. kilo-events) BEFORE the moments — DuckDB
    // would silently promote to HUGEINT where Spark's ANSI mode
    // throws, so the bound is load-bearing for the cross-engine gate.
    QDef("q235_burst_hours",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy("h").agg(count(lit(1)).as("n"))
          .localCheckpoint() // stats + ranking read it
        val stats = hourly.agg(count(lit(1)).as("hh"),
          sum("n").as("s"), sum(expr("n * n")).as("ss"))
        hourly.crossJoin(broadcast(stats))
          .withColumn("excess", expr("n * hh - s"))
          .withColumn("is_burst_3sigma",
            expr("excess > 0 AND excess * excess > 9 * (hh * ss - s * s)"))
          .orderBy(col("excess").desc, col("h").asc)
          .limit(5)
          .select(col("h"), col("n"), col("excess"),
            col("is_burst_3sigma"))
      },
      Some("""WITH hourly AS (
             |  SELECT epoch_us(ts) // 3600000000 AS h,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS hh,
             |    CAST(sum(n) AS BIGINT) AS s,
             |    CAST(sum(n * n) AS BIGINT) AS ss
             |  FROM hourly)
             |SELECT h, n, n * hh - s AS excess,
             |  (n * hh - s > 0 AND (n * hh - s) * (n * hh - s)
             |    > 9 * (hh * ss - s * s)) AS is_burst_3sigma
             |FROM hourly CROSS JOIN st
             |ORDER BY excess DESC, h ASC LIMIT 5""".stripMargin)),

    QDef("q236_lsh_geometry_sweep",
      (s, dir) => {
        val sig = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), shingleHashes(col("toks")).as("hs"))
          .withColumn("mh",
            graft.functions.TextAnalysis.minhashAffine(col("hs"), 24))
          .localCheckpoint() // every geometry + the truth set read it
        val a = sig.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
        val b = sig.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
        // full-recall truth: the prefix join's verified pair count
        // (artifact-shared with the q389/q398 truth denominator)
        val truth = Dedup
          .nearDupPrefixArtifact(Tables.documents(s, dir), "doc_id",
            "text", threshold = 0.8,
            fpKey = s"$dir#documents#neardup_prefix")
          .agg(count(lit(1)).as("n_true"))
        // tagged band-key union: one shuffle carries every geometry's
        // band keys (the (nb, r) tag keeps key spaces disjoint), one
        // distinct-pair verify pass serves all of them
        val bands = Geometries.map { case (nb, r) =>
          sig.select(col("doc_id"),
            explode(Dedup.bandKeyArray(col("mh"), nb, r)).as("bk"))
            .select(col("doc_id"), col("bk"),
              lit(nb.toLong).as("bands"), lit(r.toLong).as("rows_per_band"))
        }.reduce(_ unionAll _)
        val candTagged = bands.as("x").join(bands.as("y"),
            col("x.bk") === col("y.bk") &&
              col("x.bands") === col("y.bands") &&
              col("x.rows_per_band") === col("y.rows_per_band") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.bands").as("bands"),
            col("x.rows_per_band").as("rows_per_band"),
            col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
          .localCheckpoint() // pair dedup + per-geometry stats read it
        val ver = candTagged.select(col("doc_a"), col("doc_b")).distinct()
          .join(a, "doc_a").join(b, "doc_b")
          .select(col("doc_a"), col("doc_b"),
            ((size(array_intersect(col("hs_a"), col("hs_b")))
              .cast("double") /
              (size(col("hs_a")) + size(col("hs_b")) -
                size(array_intersect(col("hs_a"), col("hs_b"))))
              .cast("double")) >= 0.8).as("hit"))
        val perGeom = candTagged
          .join(broadcast(ver), Seq("doc_a", "doc_b"))
          .groupBy("bands", "rows_per_band")
          .agg(count(lit(1)).as("n_candidates"),
            sum(col("hit").cast("long")).as("n_verified"))
        // left join from the geometry literals: a geometry with zero
        // candidates still emits its row (the oracle's per-geometry
        // aggregate always does)
        import s.implicits._
        Geometries.map { case (nb, r) => (nb.toLong, r.toLong) }
          .toDF("bands", "rows_per_band")
          .join(broadcast(perGeom), Seq("bands", "rows_per_band"), "left")
          .crossJoin(broadcast(truth))
          .select(col("bands"), col("rows_per_band"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_verified"), lit(0L)).as("n_verified"),
            expr("(1000 * coalesce(n_verified, 0L)) div " +
              "greatest(coalesce(n_candidates, 0L), 1L)")
              .as("precision_milli"),
            expr("(1000 * coalesce(n_verified, 0L)) div " +
              "greatest(n_true, 1L)").as("recall_milli"))
      },
      Some {
        val mins = (0 until 24).map { j =>
          val (aa, bb) = affineParam(j)
          s"list_min(list_transform(sh, h -> (h * $aa + $bb) % " +
            s"$MinhashPrime))"
        }.mkString("[", ",\n  ", "]")
        // ONE pair enumeration computes all four geometry flags plus
        // the exact-Jaccard truth — five separate O(n²) scans would
        // make the sf0.1 replay minutes-slow for nothing
        val flagCols = Geometries.map { case (nb, r) =>
          val bandEq = (1 to r).map(j =>
            s"a.sig[(k-1)*$r + $j] = b.sig[(k-1)*$r + $j]")
            .mkString(" AND ")
          s"len(list_filter(generate_series(1, $nb), " +
            s"k -> $bandEq)) > 0 AS f${nb}_$r"
        }.mkString(",\n    ")
        val rows = Geometries.map { case (nb, r) =>
          s"""SELECT CAST($nb AS BIGINT) AS bands,
             |  CAST($r AS BIGINT) AS rows_per_band,
             |  CAST(sum(CASE WHEN f${nb}_$r THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_candidates,
             |  CAST(sum(CASE WHEN f${nb}_$r AND hit THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_verified
             |FROM c""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id, list_distinct(list_transform(
           |    CASE WHEN len(toks) >= 3 THEN
           |      list_transform(generate_series(1, len(toks) - 2),
           |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           |      ELSE [] END,
           |    g -> cast('0x' || substr(md5(g), 1, 8) as bigint))) AS sh
           |  FROM t),
           |m AS MATERIALIZED (SELECT s.doc_id, s.sh, $mins AS sig FROM s
           |      WHERE len(s.sh) > 0),
           |c AS MATERIALIZED (SELECT
           |    len(list_intersect(a.sh, b.sh))::DOUBLE /
           |      (len(a.sh) + len(b.sh) -
           |       len(list_intersect(a.sh, b.sh))) >= 0.8 AS hit,
           |    $flagCols
           |  FROM m a JOIN m b ON a.doc_id < b.doc_id),
           |tr AS (SELECT CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_true FROM c),
           |u AS ($rows)
           |SELECT bands, rows_per_band, n_candidates, n_verified,
           |  (1000 * n_verified) // greatest(n_candidates, 1)
           |    AS precision_milli,
           |  (1000 * n_verified) // greatest(tr.n_true, 1)
           |    AS recall_milli
           |FROM u CROSS JOIN tr""".stripMargin
      }),

    // Stratified eval-set construction: a fixed budget of K = 100
    // docs apportioned across (lang × source) strata by the Hamilton
    // largest-remainder method — the exact integer apportionment that
    // sums to K with every stratum within 1 of proportional (no float
    // quotas, no iterative divisor search), ties broken (remainder
    // desc, lang, source). Selection within a stratum is hash order
    // via the bounded partial/final TopK at k = K (alloc_i ≤ K by
    // construction), so no per-stratum window ever sees the corpus —
    // the q183 discipline. Apportionment windows run over the
    // O(#strata) frame only. Output is the reproducible eval set
    // itself: re-running on the same corpus picks the same docs.
    QDef("q237_eval_sampler",
      (s, dir) => {
        val K = 100
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"),
            graft.functions.TextAnalysis.tokenHash(
              concat(lit("ev:"), col("doc_id").cast("string"))).as("h"))
        val st = docs.groupBy("lang", "source")
          .agg(count(lit(1)).as("n"))
          .localCheckpoint() // base + leftover + rank read it
        val tot = st.agg(sum("n").as("nn"))
        val base = st.crossJoin(broadcast(tot))
          .withColumn("b", expr(s"($K * n) div nn"))
          .withColumn("rem", expr(s"($K * n) % nn"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("lang"), col("source"))
        val alloc = base // O(#strata) rows — the window is bounded
          .withColumn("rr", row_number().over(w))
          .crossJoin(broadcast(
            base.agg((lit(K.toLong) - sum("b")).as("lv"))))
          .select(col("lang"), col("source"),
            expr("b + if(rr <= lv, 1L, 0L)").as("n_alloc"))
        val ranked = graft.ops.TopK.perGroup(
          docs.withColumn("g", concat_ws("|", // unambiguous stratum key
            col("lang"), col("source"))),
          "g", struct(col("h").as("h"), col("doc_id").as("id")), K)
        // ranked is ≤ #strata · K rows by construction → broadcast it
        // back at the corpus for the attribute join
        docs.select(col("doc_id"), col("lang"), col("source"))
          .join(broadcast(ranked
            .select(col("key.id").as("doc_id"), col("rank"))), "doc_id")
          .join(broadcast(alloc), Seq("lang", "source"))
          .filter(col("rank") < col("n_alloc"))
          .select(col("doc_id"), col("lang"), col("source"),
            col("rank").as("pick_rank"))
      },
      Some {
        val hSql = "cast('0x' || substr(md5('ev:' || " +
          "CAST(doc_id AS VARCHAR)), 1, 8) as bigint)"
        s"""WITH d AS (SELECT doc_id, lang, source, $hSql AS h
           |           FROM documents),
           |st AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
           |       FROM d GROUP BY 1, 2),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM st),
           |base AS (SELECT lang, source, n,
           |    (100 * n) // nn AS b, (100 * n) % nn AS rem
           |  FROM st CROSS JOIN tot),
           |lv AS (SELECT 100 - CAST(sum(b) AS BIGINT) AS lv FROM base),
           |r AS (SELECT *, row_number() OVER (
           |    ORDER BY rem DESC, lang, source) AS rr FROM base),
           |alloc AS (SELECT lang, source,
           |    b + CASE WHEN rr <= lv.lv THEN 1 ELSE 0 END AS n_alloc
           |  FROM r CROSS JOIN lv),
           |rk AS (SELECT doc_id, lang, source,
           |    row_number() OVER (PARTITION BY lang, source
           |      ORDER BY h, doc_id) - 1 AS pick_rank
           |  FROM d)
           |SELECT rk.doc_id, rk.lang, rk.source,
           |  CAST(rk.pick_rank AS BIGINT) AS pick_rank
           |FROM rk JOIN alloc USING (lang, source)
           |WHERE rk.pick_rank < alloc.n_alloc""".stripMargin
      }),

    // Per-rule failure attribution for the q74 heuristic gate: for
    // each of the five rules, how many docs fail it and how many fail
    // ONLY it (sole blockers — relaxing that one threshold admits
    // them). This is the threshold-tuning table the composite `pass`
    // boolean cannot provide. One scan computes all five booleans
    // (identical expressions to QualityGates.heuristicPass, mirrored
    // from the proven q74 oracle forms); the rule fan-out explodes 5
    // structs per doc with map-side partial aggregation — no joins.
    QDef("q238_rule_attribution",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("toks", tokens(col("text")))
        val nTok = size(col("toks"))
        val meanTokLen = length(array_join(col("toks"), ""))
          .cast("double") / nTok.cast("double")
        val symbolRatio = length(regexp_replace(col("text"),
          lit("[A-Za-z0-9 ]"), lit(""))).cast("double") /
          col("n_chars").cast("double")
        val digitRatio = length(regexp_replace(col("text"),
          lit("[^0-9]"), lit(""))).cast("double") /
          col("n_chars").cast("double")
        val ttr = size(array_distinct(col("toks"))).cast("double") /
          nTok.cast("double")
        // Degenerate docs (zero tokens / zero chars) FAIL every
        // ratio rule by definition: the guards make the booleans
        // deterministic on both engines (unguarded, Spark's 0/0
        // divisions yield NaN/Infinity while DuckDB's yield NULL,
        // and the two fold differently through NOT/CASE — the
        // engines would diverge exactly on degenerate docs).
        val fails = Seq(
          "length" -> !(nTok >= 5 && nTok <= 100000),
          "tok_len" -> !(nTok > 0 &&
            meanTokLen >= 2.0 && meanTokLen <= 12.0),
          "symbol" -> !(col("n_chars") > 0 && symbolRatio < 0.3),
          "digit" -> !(col("n_chars") > 0 && digitRatio < 0.3),
          "ttr" -> !(nTok > 0 && ttr > 0.2))
        val withF = docs.select(fails.map { case (n, c) =>
          c.cast("long").as(s"f_$n") }: _*)
          .withColumn("nf", fails.map(f => col(s"f_${f._1}"))
            .reduce(_ + _))
        withF.select(explode(array(fails.map { case (n, _) =>
            struct(lit(n).as("rule"), col(s"f_$n").as("fail"),
              (col(s"f_$n") === 1 && col("nf") === 1)
                .cast("long").as("sole"))
          }: _*)).as("p"))
          .select(col("p.rule"), col("p.fail"), col("p.sole"))
          .groupBy("rule")
          .agg(count(lit(1)).as("nd"), sum("fail").as("n_fail"),
            sum("sole").as("n_sole_fail"))
          .select(col("rule"), col("n_fail"), col("n_sole_fail"),
            expr("(1000 * n_fail) div nd").as("fail_milli"))
      },
      Some {
        val rules = Seq(
          "length" -> "NOT (n_tokens >= 5 AND n_tokens <= 100000)",
          "tok_len" -> ("NOT (n_tokens > 0 AND mean_tok_len >= 2.0" +
            " AND mean_tok_len <= 12.0)"),
          "symbol" -> "NOT (n_chars > 0 AND symbol_ratio < 0.3)",
          "digit" -> "NOT (n_chars > 0 AND digit_ratio < 0.3)",
          "ttr" -> "NOT (n_tokens > 0 AND ttr > 0.2)")
        val fCols = rules.map { case (n, e) =>
          s"CASE WHEN $e THEN 1 ELSE 0 END AS f_$n" }.mkString(",\n    ")
        val nf = rules.map(r => s"f_${r._1}").mkString(" + ")
        val u = rules.map { case (n, _) =>
          s"SELECT '$n' AS rule, f_$n AS fail, " +
            s"CASE WHEN f_$n = 1 AND nf = 1 THEN 1 ELSE 0 END AS sole " +
            "FROM g"
        }.mkString("\nUNION ALL\n")
        s"""WITH t AS (SELECT doc_id, n_chars, text, $toksSql AS toks
           |           FROM documents),
           |m AS (SELECT doc_id, n_chars,
           |    len(toks) AS n_tokens,
           |    list_sum(list_transform(toks, x -> length(x)))::DOUBLE
           |      / len(toks) AS mean_tok_len,
           |    length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
           |      / n_chars AS symbol_ratio,
           |    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
           |      / n_chars AS digit_ratio,
           |    len(list_distinct(toks))::DOUBLE / len(toks) AS ttr
           |  FROM t),
           |f AS (SELECT doc_id, $fCols FROM m),
           |g AS (SELECT *, $nf AS nf FROM f),
           |u AS ($u)
           |SELECT rule, CAST(sum(fail) AS BIGINT) AS n_fail,
           |  CAST(sum(sole) AS BIGINT) AS n_sole_fail,
           |  CAST((1000 * CAST(sum(fail) AS BIGINT)) // count(*)
           |    AS BIGINT) AS fail_milli
           |FROM u GROUP BY rule""".stripMargin
      }),

    // Boilerplate phrase mining: the 20 most widely-carried 5-gram
    // PHRASES (by distinct-doc frequency) with their doc share — the
    // human-readable counterpart of q117's hash-level boilerplate
    // strip (this is the report a cleaning pass attaches to justify
    // its removals). Scale shape: df counts aggregate 8-byte hashes;
    // the global top-20 is one TakeOrdered; gram STRINGS shuffle only
    // for the 20 winners (broadcast semi join restricts before the
    // recovery distinct) — the corpus-side shuffle never carries
    // phrase text.
    QDef("q239_boilerplate_phrases",
      (s, dir) => {
        val grams = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"),
            explode(expr("transform(sequence(1, size(toks) - 4), " +
              "i -> array_join(slice(toks, i, 5), ' '))")).as("g"))
          .select(col("doc_id"), col("g"),
            Sketches.hash60(col("g")).as("h"))
          .localCheckpoint() // df counts + winner-string recovery
        val dfc = grams.select(col("doc_id"), col("h")).distinct()
          .groupBy("h").agg(count(lit(1)).as("df"))
        val top = dfc.orderBy(col("df").desc, col("h")).limit(20)
        val names = grams.join(broadcast(top.select("h")), "h")
          .select(col("h"), col("g")).distinct()
        val nd = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
        top.join(broadcast(names), "h")
          .crossJoin(broadcast(nd))
          .select(col("g").as("gram"), col("df").as("n_docs"),
            expr("(1000 * df) div n").as("doc_share_milli"))
      },
      Some {
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |p5 AS (SELECT doc_id, unnest(list_transform(
           |        generate_series(1, len(toks) - 4),
           |        i -> array_to_string(list_slice(toks, i, i + 4), ' ')))
           |        AS g
           |      FROM t WHERE len(toks) >= 5),
           |h AS (SELECT doc_id, g,
           |        cast('0x' || substr(md5(g), 1, 15) as bigint) AS h
           |      FROM p5),
           |dfc AS (SELECT h, CAST(count(*) AS BIGINT) AS df
           |        FROM (SELECT DISTINCT doc_id, h FROM h) x GROUP BY h),
           |top AS (SELECT h, df FROM dfc ORDER BY df DESC, h LIMIT 20),
           |names AS (SELECT DISTINCT h.h, h.g FROM h JOIN top USING (h)),
           |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
           |SELECT names.g AS gram, top.df AS n_docs,
           |  (1000 * top.df) // nd.n AS doc_share_milli
           |FROM top JOIN names USING (h) CROSS JOIN nd""".stripMargin
      }),

    // Event 3-path mining: the 10 most common consecutive
    // (type → type → type) per-user paths — the navigation-pattern
    // rollup one step deeper than q166's transition matrix. Two lag
    // windows over ONE (user, ts, event_id) sort (the q166/q199
    // contract: per-user partitions, never a corpus sort); paths
    // aggregate map-side; top-10 is one TakeOrdered.
    QDef("q240_event_paths",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"),
            col("t3")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(10)
      },
      Some("""WITH e AS (SELECT user_id, ts, event_id, event_type
             |           FROM events),
             |l AS (SELECT event_type,
             |    lead(event_type, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS t2,
             |    lead(event_type, 2) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS t3
             |  FROM e)
             |SELECT event_type || '>' || t2 || '>' || t3 AS path,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM l WHERE t3 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin)),

    // Dedup aggressiveness curve: pair count, cluster count, and docs
    // removed at thresholds 0.7 / 0.8 / 0.9 — the table that picks
    // the dedup threshold by showing what each notch actually costs.
    // ONE full-recall prefix join at the loosest threshold (0.7)
    // feeds every stratum (higher-threshold pair sets are jaccard
    // FILTERS of it — no second corpus pass); the three closures run
    // on the small pair frames, where ConnectedComponents' bounded
    // union-find gate applies.
    QDef("q241_threshold_curve",
      (s, dir) => {
        val pairsRaw = Dedup
          .nearDupPrefixArtifact(Tables.documents(s, dir), "doc_id",
            "text", threshold = 0.7,
            fpKey = s"$dir#documents#neardup_prefix")
        // all three strata filter it: inline (no root) the prefix
        // join must materialize once; served, it is already a cheap
        // parquet scan and a checkpoint would only copy it
        val pairs = if (graft.ops.ArtifactStore.root(s).isEmpty)
          pairsRaw.localCheckpoint() else pairsRaw
        val rows = Seq(700L, 800L, 900L).map { tm =>
          val p = pairs.filter(col("jaccard") >= tm.toDouble / 1000.0)
          val comp = ConnectedComponents.run(p, "doc_a", "doc_b")
          comp.agg(count(lit(1)).as("n_docs_in_clusters"),
              count_distinct(col("component")).as("n_clusters"))
            .crossJoin(broadcast(p.agg(count(lit(1)).as("n_pairs"))))
            .select(lit(tm).as("threshold_milli"), col("n_pairs"),
              col("n_clusters"),
              (col("n_docs_in_clusters") - col("n_clusters"))
                .as("n_docs_removed"))
        }
        rows.reduce(_ unionAll _)
      },
      Some {
        val closures = Seq(700, 800, 900).map { tm =>
          val t = tm / 1000.0
          // membership is the RAW ≥ 0.7 prefix-join set; the stratum
          // re-filter runs on the ROUNDED jaccard column exactly as
          // the Spark side does (nearDupPrefix emits round(j, 6) — a
          // raw filter here would drop a pair whose raw ratio sits in
          // [t − 5e-7, t) while Spark keeps its rounded value)
          val strat = "inter::DOUBLE / uni >= 0.7 AND " +
            s"round(inter::DOUBLE / uni, 6) >= $t"
          s"""e$tm AS (SELECT da AS a, db AS b FROM p
             |  WHERE $strat
             |  UNION SELECT db, da FROM p
             |  WHERE $strat),
             |reach$tm(a, b) AS (
             |  SELECT a, b FROM e$tm
             |  UNION
             |  SELECT r.a, e.b FROM reach$tm r JOIN e$tm e ON r.b = e.a),
             |cl$tm AS (SELECT a AS node, least(a, min(b)) AS component
             |          FROM reach$tm GROUP BY a),
             |s$tm AS (SELECT CAST($tm AS BIGINT) AS threshold_milli,
             |    (SELECT CAST(count(*) AS BIGINT) FROM p
             |     WHERE $strat) AS n_pairs,
             |    (SELECT CAST(count(DISTINCT component) AS BIGINT)
             |     FROM cl$tm) AS n_clusters,
             |    (SELECT CAST(count(*) AS BIGINT) FROM cl$tm) -
             |    (SELECT CAST(count(DISTINCT component) AS BIGINT)
             |     FROM cl$tm) AS n_docs_removed)""".stripMargin
        }
        s"""WITH RECURSIVE ${PipelineQueries.pairCtes(0.7, materialized = true)},
           |${closures.mkString(",\n")}
           |SELECT * FROM s700
           |UNION ALL SELECT * FROM s800
           |UNION ALL SELECT * FROM s900""".stripMargin
      })
  )
}
