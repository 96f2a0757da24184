package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis._
import graft.ops.{BpeTrainer, Dedup, Sketches}
import graft.ops.VectorSearch._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventh pipeline group — the corpus-analysis / asymmetric-dedup
  * layer:
  *
  *  - q116: PMI bigram collocations — phrase-vocabulary mining for
  *    tokenizer construction and n-gram feature selection.
  *  - q117: cross-document boilerplate removal — paragraphs repeated
  *    across >= 5% of documents are navigation/footer boilerplate and
  *    are stripped from EVERY document (distinct from q81, which keeps
  *    the first occurrence: boilerplate has no canonical owner).
  *  - q118: containment join — one-sided near-dup C(a→b) =
  *    |S(a)∩S(b)|/|S(a)|, the quotation/excerpt detector that Jaccard
  *    structurally misses when the container is much larger than the
  *    contained document (prefix-filter candidate generation, full
  *    recall — ops/Dedup.containmentJoin).
  *  - q119: BPE tokenizer APPLY at corpus scale — train k merges (the
  *    q99 loop), then tokenize every document with the padded-string
  *    replace chain: one scan, k codegen'd literal replaces, no
  *    shuffle. The oracle replays train AND apply end to end.
  *
  * Float rules as established: PMI terms quantize to integer
  * micro-nats before any aggregation/compare; division trees mirror
  * the oracle SQL shape token for token.
  */
object PipelineQueries7 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "cast('0x' || substr(md5(__T__), 1, 8) as bigint)"

  private val rawPq =
    s"read_parquet('${FixtureGen.FixtureDir}/raw_docs.parquet/*.parquet')"

  private def rawDocs(s: SparkSession): DataFrame =
    s.read.parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")

  /** Count floor for collocation candidates (applied BEFORE the
    * unigram joins, so light bigrams never join).
    */
  private val PmiMinCount = 20L

  /** Boilerplate document-frequency threshold: a paragraph seen in
    * >= ceil(5% of docs) distinct documents. Integer ceil — no float
    * compare anywhere in the gate.
    */
  private val BoilerPct20 = 20L // threshold = (n_docs + 19) div 20

  // ---- vector fragments (lockstep with PipelineQueries6's copies) ----
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSql(a: String): String = VectorOracleSql.norm(a)
  private def cosSql(a: String, b: String): String =
    VectorOracleSql.cos(a, b)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** DuckDB replay of [[graft.ops.VectorSearch.assignBest]] (the q106
    * pattern): descending (sim, cell) struct sort vs literal centroids.
    */
  private def cellsSql(centroids: Array[Array[Double]]): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
  }

  /** q121's late-bound oracle: trained-centroid literals. */
  private object LabelOracle { @volatile var sql: Option[String] = None }

  /** The q123 vocab-id table (tok, cnt, vocab_id), shared with q124's
    * encoder so the two can never desynchronize: contiguous ids in
    * (count desc, token) order via the composite-bucket two-level rank
    * (see the q123 QDef comment for the Zipf argument).
    */
  private def vocabIdsDf(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("nc", -col("cnt"))
      .withColumn("bucket",
        struct(col("nc"), substring(col("tok"), 1, 1).as("pfx")))
      .withColumn("one", lit(1L))
      .localCheckpoint() // window pass + offsets agg share this
    graft.ops.PrefixSum
      .twoLevelPrev(counts, Seq(), "bucket", "tok", "one", "nc",
        outCol = "vocab_id")
      .select(col("tok"), col("cnt"), col("vocab_id"))
  }

  val defs: Seq[QDef] = Seq(

    // PMI bigram collocations: pmi = ln( (c12/N2) / ((c1/N1)(c2/N1)) )
    // over adjacent token pairs, count floor >= 20. The floor prunes
    // the bigram table BEFORE the two unigram joins (map-side-combined
    // counts on both sides; totals broadcast), so at 100 TB the join
    // only sees bigrams that can matter. One checkpointed token-array
    // scan feeds both count streams. Each PMI quantizes to integer
    // micro-nats with the division tree mirrored in the oracle — one
    // ln per surviving bigram, no float aggregation anywhere.
    QDef("q116_pmi_collocations",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toksDf = docs.select(tokens(col("text")).as("toks"))
          .localCheckpoint() // feeds the unigram AND bigram streams
        val uni = toksDf.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c1"))
          .localCheckpoint() // feeds N1, the w1 join, and the w2 join
        val n1 = uni.agg(sum(col("c1")).as("n1"))
        val bc = toksDf.filter(size(col("toks")) >= 2)
          .select(explode(transform(
            sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2")))).as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          .localCheckpoint() // feeds N2 and the floored candidate set
        val n2 = bc.agg(sum(col("c12")).as("n2"))
        bc.filter(col("c12") >= lit(PmiMinCount))
          .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
          .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
          .crossJoin(broadcast(n1))
          .crossJoin(broadcast(n2))
          .withColumn("pmi_micro", floor(lit(1000000.0) * log(
            (col("c12").cast("double") / col("n2").cast("double")) /
              ((col("c1a").cast("double") / col("n1").cast("double")) *
                (col("c1b").cast("double") / col("n1").cast("double")))))
            .cast("long"))
          .select(col("w1"), col("w2"), col("c12").as("cnt"),
            col("pmi_micro"))
      },
      Some(s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
              |b AS (SELECT toks[i] AS w1, toks[i+1] AS w2
              |      FROM t, unnest(generate_series(1, len(toks) - 1)) g(i)
              |      WHERE len(toks) >= 2),
              |bc AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
              |n2 AS (SELECT sum(c12) AS n2 FROM bc),
              |u AS (SELECT unnest(toks) AS w FROM t),
              |uc AS (SELECT w, count(*) AS c1 FROM u GROUP BY w),
              |n1 AS (SELECT sum(c1) AS n1 FROM uc)
              |SELECT bc.w1, bc.w2, CAST(bc.c12 AS BIGINT) AS cnt,
              |  CAST(floor(1000000.0 * ln(
              |    (CAST(bc.c12 AS DOUBLE) / CAST(n2.n2 AS DOUBLE)) /
              |    ((CAST(u1.c1 AS DOUBLE) / CAST(n1.n1 AS DOUBLE)) *
              |     (CAST(u2.c1 AS DOUBLE) / CAST(n1.n1 AS DOUBLE)))))
              |    AS BIGINT) AS pmi_micro
              |FROM bc
              |JOIN uc u1 ON bc.w1 = u1.w
              |JOIN uc u2 ON bc.w2 = u2.w
              |CROSS JOIN n1 CROSS JOIN n2
              |WHERE bc.c12 >= $PmiMinCount""".stripMargin)),

    // Cross-document boilerplate removal: a paragraph appearing in
    // >= 5% of DISTINCT documents is boilerplate (headers, footers,
    // cookie banners) and is stripped everywhere — unlike q81's
    // first-occurrence dedup, boilerplate has no canonical owner to
    // keep. Scale shape: one paragraph-hash distinct-doc aggregation;
    // the boilerplate set is tiny by construction (df >= 5% of corpus
    // caps it at 20 hashes per percent of mass) so the mark-join
    // broadcasts; doc reassembly is the q81 pos-ordered rebuild.
    QDef("q117_boilerplate_strip",
      (s, _) => {
        val raw = rawDocs(s)
        val paras = raw.select(col("doc_id"),
            posexplode(split(col("text"), lit("\n\n")))
              .as(Seq("pos", "para")))
          .withColumn("ph", md5(col("para")))
          .localCheckpoint() // feeds the df agg AND the rebuild
        val nd = raw.agg(count(lit(1)).as("nd"))
        val boiler = paras.groupBy("ph")
          .agg(count_distinct(col("doc_id")).as("df"))
          .crossJoin(broadcast(nd))
          .filter(col("df") >=
            expr(s"(nd + ${BoilerPct20 - 1}) div $BoilerPct20"))
          .select(col("ph")).withColumn("b", lit(true))
        paras.join(broadcast(boiler), Seq("ph"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_paras"),
            sum(when(col("b"), 1L).otherwise(0L)).as("n_removed"),
            // collect_list skips nulls: only non-boiler paras collect
            concat_ws("\n\n", transform(
              array_sort(collect_list(when(col("b").isNull,
                struct(col("pos"), col("para"))))),
              p => p.getField("para"))).as("text_kept"))
          .select(col("doc_id"), col("n_paras"), col("n_removed"),
            col("text_kept"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
              |  FROM $rawPq),
              |p AS (SELECT doc_id, unnest(ps) AS para,
              |        unnest(generate_series(0, len(ps) - 1)) AS pos
              |      FROM d),
              |h AS (SELECT doc_id, pos, para, md5(para) AS ph FROM p),
              |nd AS (SELECT count(*) AS nd FROM d),
              |bl AS (SELECT ph FROM
              |        (SELECT ph, count(DISTINCT doc_id) AS df FROM h
              |         GROUP BY ph) f
              |       CROSS JOIN nd
              |       WHERE df >= (nd + ${BoilerPct20 - 1}) // $BoilerPct20),
              |m AS (SELECT h.*, bl.ph IS NOT NULL AS b
              |      FROM h LEFT JOIN bl ON h.ph = bl.ph)
              |SELECT doc_id,
              |  CAST(count(*) AS BIGINT) AS n_paras,
              |  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_removed,
              |  coalesce(string_agg(CASE WHEN NOT b THEN para END,
              |    chr(10) || chr(10) ORDER BY pos), '') AS text_kept
              |FROM m GROUP BY doc_id""".stripMargin)),

    // Containment join: ordered pairs where >= 90% of doc_a's distinct
    // 3-shingles appear in doc_b — quotations, excerpts, and
    // copy-with-additions that symmetric Jaccard (q25/q66) misses by
    // construction. Full recall via the one-sided prefix filter
    // (Dedup.containmentJoin scaladoc has the pigeonhole argument);
    // oracle = exhaustive exact containment over all ordered pairs.
    QDef("q118_containment",
      (s, dir) => Dedup.containmentJoin(
        Tables.documents(s, dir), "doc_id", "text", threshold = 0.9),
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |s AS (
              |  SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")})) AS sh
              |  FROM t),
              |p AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    len(list_intersect(a.sh, b.sh)) AS inter,
              |    len(a.sh) AS la
              |  FROM s a JOIN s b ON a.doc_id != b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
              |SELECT doc_a, doc_b,
              |  round(inter::DOUBLE / la, 6) AS containment
              |FROM p WHERE inter::DOUBLE / la >= 0.9""".stripMargin)),

    // BPE tokenizer APPLY at corpus scale: train 5 merges (the q99
    // bounded-collect loop — one driver row per round), then tokenize
    // EVERY document by replaying the merges on the padded-string
    // form: k literal `replace`s in one scan, codegen'd, no shuffle —
    // the plan a 100 TB tokenization pass needs (the trained merge
    // list is a plan-time constant there too, typically 32k merges
    // applied via a trie kernel; the replace chain is the k<=dozens
    // regime). Oracle: the q99 unrolled train chain extended per-doc —
    // it replays train AND apply end to end, so this checks the full
    // tokenize path, not just the merge list.
    QDef("q119_bpe_apply",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val merges = BpeTrainer.trainArtifact(docs, "text", k = 5,
          fpKey = s"$dir#documents#text")
        docs.select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens_raw"),
            BpeTrainer.applyMerges(col("toks"), merges).as("bt"))
          .select(col("doc_id"), col("n_tokens_raw"),
            size(col("bt")).cast("long").as("n_tokens_bpe"),
            array_join(col("bt"), " ").as("bpe_text"))
      },
      Some(bpeApplyOracleSql(5))),

    // Quality-aware canonical selection: q69 keeps the MINIMUM id per
    // dedup cluster — fine as an identity rule, but production passes
    // keep the BEST representative (here: most tokens, ties by id) so
    // dedup never trades a full document for its truncated mirror.
    // Same cluster machinery (LSH pairs → connected components), then
    // a per-cluster integer argmax: max(struct(n_tokens, -doc_id)) is
    // one map-side-combined aggregation — no window over mega-clusters
    // at scale, and the tie key is integer so no float compare decides
    // retention. Oracle: recursive-CTE closure over brute-force exact
    // pairs + the same (n_tokens desc, doc_id asc) selection.
    QDef("q120_canonical_select",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.nearDupMinhashArtifact(docs, "doc_id", "text",
          fpKey = s"$dir#documents#id_text")
        val comp = graft.ops.ConnectedComponents.run(pairs, "doc_a", "doc_b")
          .withColumnRenamed("node", "doc_id")
        val base = docs
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_tokens"))
          .join(comp, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("component"), col("doc_id")).as("cluster_id"))
          .localCheckpoint() // feeds the argmax AND the output join
        val best = base.groupBy("cluster_id")
          .agg(max(struct(col("n_tokens"), (-col("doc_id")).as("nid")))
            .as("m"))
          .select(col("cluster_id"), (-col("m.nid")).as("keep_id"))
        base.join(best, "cluster_id")
          .select(col("doc_id"), col("cluster_id"), col("n_tokens"),
            (col("doc_id") === col("keep_id")).as("keep"))
      },
      Some(s"""WITH RECURSIVE t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |s AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")})) AS sh
              |  FROM t),
              |p AS (
              |  SELECT a.doc_id AS da, b.doc_id AS db
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh)
              |        - len(list_intersect(a.sh, b.sh))) >= 0.8),
              |e AS (SELECT da AS a, db AS b FROM p
              |      UNION SELECT db, da FROM p),
              |reach(a, b) AS (
              |  SELECT a, b FROM e
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
              |cl AS (SELECT a AS doc_id, min(b) AS mn FROM reach GROUP BY a),
              |base AS (
              |  SELECT t.doc_id, len(t.toks) AS n_tokens,
              |    least(t.doc_id, coalesce(cl.mn, t.doc_id)) AS cluster_id
              |  FROM t LEFT JOIN cl USING (doc_id)),
              |rk AS (
              |  SELECT doc_id, cluster_id, n_tokens,
              |    row_number() OVER (PARTITION BY cluster_id
              |      ORDER BY n_tokens DESC, doc_id ASC) AS rn
              |  FROM base)
              |SELECT b.doc_id, b.cluster_id,
              |  CAST(b.n_tokens AS BIGINT) AS n_tokens,
              |  b.doc_id = k.doc_id AS keep
              |FROM base b JOIN (SELECT cluster_id, doc_id FROM rk
              |                  WHERE rn = 1) k USING (cluster_id)"""
        .stripMargin)),

    // kNN label propagation within k-means cells — the
    // classifier-propagation step of FineWeb-Edu-style curation: a
    // small SEED set carries labels (here vec_id % 4 == 0 with label
    // vec_id % 3 as the deterministic stand-in for human/LLM grades),
    // and every unlabeled vector takes the majority label of its 3
    // nearest labeled neighbors WITHIN ITS CLUSTER. The cell join is
    // the SemDeDup shape: candidate volume is Σ cell·|labeled ∩ cell|,
    // never n·|labeled|; cross-cell neighbors are the accepted misses
    // and k dials recall. Per-vector top-3 is a bounded
    // collect_list/sort/slice inside the cell (no global window);
    // majority-with-smallest-label tiebreak is an integer struct sort.
    // Oracle: full replay from centroid literals (the q106/q107
    // late-oracle pattern).
    QDef("q121_knn_label_prop",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val init = kmeansCentroids(
          sampleVectors(emb, "vec_id", "embedding", n = 256, seed = 99),
          k = 8, iters = 0, seed = 99)
        val cents = lloydRoundsDistributed(emb, "vec_id", "embedding",
          init, rounds = 2)
        LabelOracle.sql = Some(
          s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
             |a AS (SELECT vec_id, v,
             |        list_reverse_sort(${cellsSql(cents)})[1].cell AS cell
             |      FROM e),
             |lab AS (SELECT vec_id AS nb, v AS vb, cell,
             |          vec_id % 3 AS label
             |        FROM a WHERE vec_id % 4 = 0),
             |unl AS (SELECT vec_id, v, cell FROM a WHERE vec_id % 4 <> 0),
             |c AS (SELECT u.vec_id, l.nb, l.label,
             |        ${cosSql("u.v", "l.vb")} AS sim
             |      FROM unl u JOIN lab l USING (cell)),
             |g AS (SELECT vec_id, count(*) AS n_cands,
             |        list_sort(list({'ns': -sim, 'nb': nb,
             |          'label': label})) AS srt
             |      FROM c GROUP BY vec_id),
             |m AS (SELECT vec_id, n_cands,
             |        list_transform(srt[1:3], t -> t.label) AS labs
             |      FROM g),
             |p AS (SELECT vec_id, n_cands,
             |        list_sort(list_transform(list_distinct(labs),
             |          l -> {'nc': -len(list_filter(labs, x -> x = l)),
             |                'l': l}))[1].l AS pred
             |      FROM m)
             |SELECT u.vec_id, u.cell,
             |  CAST(coalesce(p.n_cands, 0) AS BIGINT) AS n_cands,
             |  CAST(coalesce(p.pred, -1) AS BIGINT) AS pred_label
             |FROM unl u LEFT JOIN p USING (vec_id)""".stripMargin)
        val e = emb.select(col("vec_id").as("id"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", norm(col("v")))
          .withColumn("cell", assignBest(col("v"), cents).getField("cell"))
          .localCheckpoint() // feeds labeled side, probe side, output
        val lab = e.filter(col("id") % 4 === 0)
          .select(col("cell"), col("id").as("nb"), col("v").as("vb"),
            col("nrm").as("nb_nrm"), (col("id") % 3).as("label"))
        val unl = e.filter(col("id") % 4 =!= 0)
        val top = unl.join(lab, Seq("cell"))
          .withColumn("sim",
            dot(col("v"), col("vb")) / (col("nrm") * col("nb_nrm")))
          .groupBy("id")
          .agg(count(lit(1)).as("n_cands"),
            slice(array_sort(collect_list(struct((-col("sim")).as("ns"),
              col("nb"), col("label")))), 1, 3).as("top3"))
          .withColumn("labs",
            transform(col("top3"), t => t.getField("label")))
          .withColumn("pred", element_at(array_sort(
            transform(array_distinct(col("labs")), l =>
              struct((-size(filter(col("labs"), x => x === l))).as("nc"),
                l.as("l")))), 1).getField("l"))
        unl.select(col("id"), col("cell"))
          .join(top.select(col("id"), col("n_cands"), col("pred")),
            Seq("id"), "left")
          .select(col("id").as("vec_id"), col("cell"),
            coalesce(col("n_cands"), lit(0L)).as("n_cands"),
            coalesce(col("pred"), lit(-1L)).as("pred_label"))
      },
      None,
      Some(() => LabelOracle.sql)),

    // Shard manifest emission: the reproducibility artifact a 100 TB
    // shard-writing job must produce — per shard: doc count, token
    // count, and an ORDER-FREE content checksum (bit_xor of per-doc
    // 60-bit content hashes: commutative, overflow-free, identical
    // under any partitioning / arrival order, unlike a sum which
    // wraps differently across engines). Reuses q97's token-balanced
    // assignment (same code path), so the manifest provably describes
    // the shards q97 emits; one map-side-combined aggregation on top.
    QDef("q122_shard_manifest",
      (s, dir) => {
        // the manifest hash rides the assignment's own scan (extra
        // column pass-through) — no second corpus pass, no join back
        graft.ops.ShardAssign
          .tokenBalanced(Tables.documents(s, dir), nShards = 64,
            extra = Seq("h60" -> Sketches.hash60(col("text"))))
          .groupBy("shard_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            expr("bit_xor(h60)").as("checksum"))
          .select(col("shard_id"), col("n_docs"), col("n_tokens"),
            col("checksum"))
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
              |  cast('0x' || substr(md5('shard:' ||
              |    CAST(doc_id AS VARCHAR)), 1, 8) as bigint) AS h,
              |  cast('0x' || substr(md5(text), 1, 15) as bigint) AS h60
              |  FROM documents),
              |tot AS (SELECT sum(n_tokens) AS total FROM t),
              |c AS (SELECT doc_id, n_tokens, h60,
              |  coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |    AS prev_tokens
              |  FROM t),
              |a AS (SELECT doc_id, n_tokens, h60,
              |  prev_tokens // greatest(tot.total // 64, 1) AS shard_id
              |  FROM c CROSS JOIN tot)
              |SELECT CAST(shard_id AS BIGINT) AS shard_id,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              |  CAST(bit_xor(h60) AS BIGINT) AS checksum
              |FROM a GROUP BY shard_id""".stripMargin)),

    // Stable contiguous vocabulary ids ordered by (count desc, token)
    // — the id table every token-id shard emission needs. The naive
    // row_number window is a single-task global sort; the q75
    // two-level rank generalizes, but frequency order is
    // Zipf-HOSTILE: half the vocabulary ties at count=1, so bucketing
    // by count alone recreates the one-giant-partition problem. The
    // bucket is therefore the composite struct(-count, token prefix) —
    // still monotone in the (-count, token) sort order, so the
    // in-bucket rank + broadcast bucket offsets decomposition holds,
    // and no bucket outgrows (one count value × one prefix).
    QDef("q123_vocab_ids",
      (s, dir) => vocabIdsDf(s, dir),
      Some(s"""WITH e AS (SELECT unnest($toksSql) AS tok FROM documents),
              |c AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok)
              |SELECT tok, CAST(cnt AS BIGINT) AS cnt,
              |  CAST(row_number() OVER (ORDER BY cnt DESC, tok) - 1
              |    AS BIGINT) AS vocab_id
              |FROM c""".stripMargin)),

    // Corpus token-id encoding: every document rewritten as its q123
    // vocabulary ids — the final gather before binary shard emission.
    // Scale shape: one positional explode, one equi-join on the token
    // (broadcast when the vocab fits, sort-merge otherwise — Catalyst
    // decides from stats), and a bounded per-doc ordered re-assembly
    // (collect bounded by doc length, never a window across docs).
    // Ids are emitted as a joined string so the hash compare is
    // byte-exact across engines.
    QDef("q124_token_ids",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = vocabIdsDf(s, dir).select(col("tok"), col("vocab_id"))
        val pos = docs
          .select(col("doc_id"), posexplode_outer(tokens(col("text")))
            .as(Seq("pos", "tok")))
          .filter(col("tok").isNotNull) // outer + generated-col guard
        pos.join(vocab, "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            array_join(transform(
              array_sort(collect_list(struct(col("pos"), col("vocab_id")))),
              p => p.getField("vocab_id").cast("string")), " ")
              .as("ids"))
          .unionByName(
            docs.filter(size(tokens(col("text"))) === 0)
              .select(col("doc_id"), lit(0L).as("n_tokens"),
                lit("").as("ids")))
      },
      Some(s"""WITH e AS (SELECT unnest($toksSql) AS tok FROM documents),
              |c AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
              |v AS (SELECT tok,
              |        row_number() OVER (ORDER BY cnt DESC, tok) - 1
              |          AS vocab_id
              |      FROM c),
              |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |p AS (SELECT doc_id, unnest(toks) AS tok,
              |        unnest(generate_series(0, len(toks) - 1)) AS pos
              |      FROM t WHERE len(toks) > 0),
              |j AS (SELECT p.doc_id, p.pos, v.vocab_id
              |      FROM p JOIN v USING (tok))
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              |  string_agg(CAST(vocab_id AS VARCHAR), ' ' ORDER BY pos)
              |    AS ids
              |FROM j GROUP BY doc_id
              |UNION ALL
              |SELECT doc_id, 0 AS n_tokens, '' AS ids
              |FROM t WHERE len(toks) = 0""".stripMargin)),

    // Bounded top-k per group — the longest 10 documents per language
    // (the curriculum/audit head-sampling shape). Honest baseline
    // note: for the `row_number <= k` FILTER idiom (q9), Catalyst
    // since 3.5 already inserts map-side + final WindowGroupLimit
    // (verified in q9's plan), so that window is NOT the naive
    // one-task-per-group trap. ops/TopK is the same two-phase bound as
    // an explicit composable operator: heap-shaped array top-k instead
    // of a per-group sort, no Window/rank-filter idiom required at the
    // call site, and exact under any partitioning (spec-pinned).
    // Ranking key struct(-n_tokens, doc_id) is integer and total, so
    // rank order is engine-independent.
    QDef("q125_topk_per_group",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("lang"), col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_tokens"))
        graft.ops.TopK.perGroup(docs, "lang",
            struct((-col("n_tokens")).as("nn"), col("doc_id")), k = 10)
          .select(col("lang"), col("rank"),
            col("key.doc_id").as("doc_id"),
            (-col("key.nn")).as("n_tokens"))
      },
      Some(s"""WITH t AS (SELECT lang, doc_id,
              |  CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
              |r AS (SELECT lang, doc_id, n_tokens,
              |  row_number() OVER (PARTITION BY lang
              |    ORDER BY n_tokens DESC, doc_id) - 1 AS rank
              |  FROM t)
              |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_tokens
              |FROM r WHERE rank < 10""".stripMargin)),

    // Deterministic multi-source interleave: the training-order mixer
    // — round-robin across sources in a reproducible hash order, so a
    // resumed/re-run job reads the identical sequence and no source
    // floods any window of the stream. Per-source ranks come from the
    // grouped two-level prefix sum (PrefixSum with a group column —
    // sharded windows, offsets broadcast, no per-source global sort);
    // global position = rank · #sources + source-index is pure
    // integer arithmetic. Positions are sparse after the shortest
    // source exhausts — consumers sort by pos, which stays total.
    QDef("q126_source_interleave",
      (s, dir) => {
        val h = tokenHash(concat(lit("ilv:"), col("doc_id").cast("string")))
        val t = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), h.as("h"))
          .withColumn("bucket", floor(col("h") / lit(1L << 24)).cast("long"))
          .withColumn("one", lit(1L))
          .localCheckpoint() // rank pass + offsets agg share this
        val srcIdx = t.select(col("source")).distinct()
          .groupBy().agg(sort_array(collect_list(col("source"))).as("ss"))
          .select(size(col("ss")).cast("long").as("ns"),
            posexplode(col("ss")).as(Seq("sidx", "source")))
        graft.ops.PrefixSum
          .twoLevelPrev(t, Seq("source"), "bucket", "doc_id", "one", "h",
            outCol = "src_rank")
          .join(broadcast(srcIdx), "source")
          .select(col("source"), col("doc_id"), col("src_rank"),
            (col("src_rank") * col("ns") + col("sidx")).as("pos"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
              |  cast('0x' || substr(md5('ilv:' ||
              |    CAST(doc_id AS VARCHAR)), 1, 8) as bigint) AS h
              |  FROM documents),
              |r AS (SELECT source, doc_id,
              |  row_number() OVER (PARTITION BY source
              |    ORDER BY h, doc_id) - 1 AS src_rank
              |  FROM t),
              |si AS (SELECT source,
              |  dense_rank() OVER (ORDER BY source) - 1 AS sidx
              |  FROM (SELECT DISTINCT source FROM t)),
              |ns AS (SELECT count(*) AS ns FROM si)
              |SELECT r.source, r.doc_id,
              |  CAST(r.src_rank AS BIGINT) AS src_rank,
              |  CAST(r.src_rank * ns.ns + si.sidx AS BIGINT) AS pos
              |FROM r JOIN si USING (source) CROSS JOIN ns"""
        .stripMargin)),

    // Length-bucketed batching: order documents by (length, id), cut
    // into fixed-size batches of 32, and report each batch's padding
    // waste (32·max_len − Σlen — what a training loop pads to the
    // batch max). Length-sorted batching is the standard dynamic-
    // batching trick; the rank is the SAME composite-bucket two-level
    // construction as q123 (length ties mass exactly like Zipf counts:
    // thousands of docs share the common lengths, so the bucket is
    // struct(len, id-range), monotone in the (len, id) order with no
    // bucket outgrowing one length × one id range). Waste is integer
    // end to end.
    QDef("q127_length_batches",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("len"))
          .withColumn("bucket",
            struct(col("len"), floor(col("doc_id") / lit(1024L)).as("idr")))
          .withColumn("one", lit(1L))
          .localCheckpoint() // window pass + offsets agg share this
        graft.ops.PrefixSum
          .twoLevelPrev(t, Seq(), "bucket", "doc_id", "one", "len",
            outCol = "rank")
          .withColumn("batch_id", expr("rank div 32"))
          .groupBy("batch_id")
          .agg(count(lit(1)).as("n_docs"), max(col("len")).as("max_len"),
            sum(col("len")).as("sum_len"))
          .withColumn("pad_waste",
            col("n_docs") * col("max_len") - col("sum_len"))
          .select(col("batch_id"), col("n_docs"), col("max_len"),
            col("sum_len"), col("pad_waste"))
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |  CAST(len($toksSql) AS BIGINT) AS len FROM documents),
              |r AS (SELECT doc_id, len,
              |  row_number() OVER (ORDER BY len, doc_id) - 1 AS rank
              |  FROM t),
              |b AS (SELECT rank // 32 AS batch_id, len FROM r)
              |SELECT CAST(batch_id AS BIGINT) AS batch_id,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(max(len) AS BIGINT) AS max_len,
              |  CAST(sum(len) AS BIGINT) AS sum_len,
              |  CAST(count(*) * max(len) - sum(len) AS BIGINT) AS pad_waste
              |FROM b GROUP BY batch_id""".stripMargin)),

    // Per-domain corpus rollup over the crawl-shaped raw_docs: extract
    // every URL's domain, and per domain count occurrences, distinct
    // documents, and the documents' mean quality proxy (token count,
    // integer-summed) — the aggregation a domain-level filter decision
    // (q82's blocklist, FineWeb-style domain pruning) is made FROM.
    // One scan + one explode + one agg; the regex is ASCII-simple so
    // Java regex and RE2 agree (the q80/q82 convention).
    QDef("q128_domain_rollup",
      (s, _) => {
        val raw = rawDocs(s)
        val urls = raw
          .select(col("doc_id"),
            size(split(col("text"), lit(" "))).cast("long").as("n_toks"),
            explode_outer(regexp_extract_all(col("text"),
              lit("https?://([a-z0-9.-]+)/"), lit(1))).as("domain"))
          .filter(col("domain").isNotNull) // outer + generated-col guard
        urls.groupBy("domain")
          .agg(count(lit(1)).as("n_urls"),
            count_distinct(col("doc_id")).as("n_docs"),
            sum(col("n_toks")).as("sum_doc_toks"))
          .select(col("domain"), col("n_urls"), col("n_docs"),
            col("sum_doc_toks"))
      },
      Some(s"""WITH u AS (SELECT doc_id,
              |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
              |  unnest(regexp_extract_all(text,
              |    'https?://([a-z0-9.-]+)/', 1)) AS domain
              |  FROM $rawPq)
              |SELECT domain,
              |  CAST(count(*) AS BIGINT) AS n_urls,
              |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              |  CAST(sum(n_toks) AS BIGINT) AS sum_doc_toks
              |FROM u GROUP BY domain""".stripMargin))
  )

  /** The q99 unrolled train chain, carrying doc_id through so the
    * FINAL corpus state (not the merge list) is the output: per-doc
    * raw/BPE token counts and the tokenized text. Kept in lockstep
    * with PipelineQueries4.bpeOracleSql.
    */
  private def bpeApplyOracleSql(k: Int): String = {
    val toksFrag = "list_filter(string_split(p, ' '), x -> x != '')"
    val pairsFrag = "CASE WHEN len(toks) >= 2 THEN " +
      "list_transform(generate_series(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1]) ELSE [] END"
    val stages = (1 to k).map { i =>
      s"""c$i AS (SELECT pair, count(*) AS cnt FROM (
         |  SELECT unnest($pairsFrag) AS pair FROM (
         |    SELECT $toksFrag AS toks FROM t${i - 1}) x) y GROUP BY pair),
         |m$i AS (SELECT pair FROM c$i
         |        ORDER BY cnt DESC, pair ASC LIMIT 1),
         |t$i AS (SELECT doc_id, n_raw, replace(p,
         |    ' ' || (SELECT replace(pair, ' ', '  ') FROM m$i) || ' ',
         |    ' ' || (SELECT replace(pair, ' ', chr(31)) FROM m$i) || ' ')
         |    AS p
         |  FROM t${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH t0 AS (SELECT doc_id, len($toksSql) AS n_raw,
       |  ' ' || array_to_string($toksSql, '  ') || ' ' AS p
       |  FROM documents),
       |$stages
       |SELECT doc_id, CAST(n_raw AS BIGINT) AS n_tokens_raw,
       |  CAST(len($toksFrag) AS BIGINT) AS n_tokens_bpe,
       |  array_to_string($toksFrag, ' ') AS bpe_text
       |FROM t$k""".stripMargin
  }
}
