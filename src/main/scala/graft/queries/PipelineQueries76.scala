package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.ops.ArtifactStore
import graft.streaming.BlockIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventy-sixth pipeline group — the write-time fingerprint-sidecar
  * protocol extended to the INGEST sink (the r14 verdict #1 ask): the
  * reference-shaped fact tables now commit per-partition `_fp`
  * sidecars with each batch, so the ETL half addresses and
  * delta-rebuilds its artifacts the same way the LLM half's maintained
  * stores do — O(#commits) metadata reads, zero corpus scans.
  *
  *  - q388: a part-addressed artifact over the INGESTED `transactions`
  *    table, driven through a real multi-batch ingest lifecycle at the
  *    HEIGHT-BUCKETED layout (r15 verdict #1): 10 blocks arrive and
  *    the txn-type rollup artifact builds from the write-time sidecars
  *    — one bucket-sized build per committed `hb=` bucket, O(#buckets)
  *    jobs regardless of chain length, never a table scan; 5 more
  *    blocks commit and the re-serve rebuilds ONLY the dirtied buckets
  *    (FactSidecarSpec pins the build counts); a compaction then folds
  *    the multi-slice bucket — fingerprint-invariant, so the final
  *    serve rebuilds NOTHING and is a pure multi-path parquet scan.
  *    The oracle computes the same rollup from the block fixture's
  *    transactions directly — the ingest, the sidecar addressing, the
  *    compaction, and the artifact serving audited as one contract.
  *    The benched lifecycle is deliberately SMALL (15 blocks): what it
  *    measures is the protocol. (The bucketed layout exists because
  *    its per-block ancestor made every partition a part-build job —
  *    a 60-block run spent 4/5 of its time on job scheduling.)
  *
  * CONCURRENCY SCOPE: like q383–q387, drives a fixed `target/` sink —
  * correct under the strictly-single-threaded driver contract
  * (see [[PipelineQueries75]]'s scope note).
  */
object PipelineQueries76 {

  /** The multi-probe near-dup measurement shared by q389 (inline
    * corpus keys) and q398 (MAINTAINED served corpus keys,
    * PipelineQueries77): signature table at the recall-starved
    * [[MultiProbeNearDupSql]] geometry, tagged probe-level union (one
    * shuffle carries every level's keys), candidate pairs, exact
    * verification, recall vs the prefix-join full-recall truth.
    * `corpusKeysOf` maps the checkpointed signature table (doc_id,
    * hs, mh, mh2) to the corpus-side (doc_id, bk) keys — the ONLY
    * thing the two queries differ in, so their oracle is shared and
    * cannot drift. */
  private[queries] def multiProbeNearDup(s: SparkSession, dir: String)
      (corpusKeysOf: DataFrame => DataFrame): DataFrame = {
    import graft.functions.TextAnalysis
    import graft.ops.Dedup
    val nb = MultiProbeNearDupSql.nb
    val r = MultiProbeNearDupSql.r
    val nh = nb * r
    def sigBase = graft.Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        TextAnalysis.shingleHashes(col("toks")).as("hs"))
      .withColumn("mh", TextAnalysis.minhashAffine(col("hs"), nh))
      .withColumn("mh2", TextAnalysis.minhash2Affine(col("hs"), nh))
    // keys, probes, and verification read it — and BOTH q389 and q398
    // need exactly this table, so it is artifact-served: one
    // tokenize+minhash corpus pass per sweep, the second query reads
    // parquet (identical integer rows). No root → the inline
    // checkpointed shape.
    val sig =
      if (graft.ops.ArtifactStore.root(s).isEmpty) sigBase.localCheckpoint()
      else graft.ops.ArtifactStore.buildOrServe(s, "multiprobe_sig",
        graft.ops.ArtifactStore.fingerprint(
          graft.Tables.documents(s, dir).select(col("doc_id"), col("text")),
          s"$dir#documents#id_text"),
        s"nb=$nb,r=$r", s"$dir#documents#multiprobe")(sigBase)
    val corpusKeys = corpusKeysOf(sig)
    // tagged probe-side union (the q236 sweep idiom): one shuffle
    // carries every probe level's keys, one verify pass serves all
    val probeKeys = Seq(0, 1, 2).map { p =>
      sig.select(col("doc_id"), explode(Dedup.multiProbeBandKeys(
          col("mh"), col("mh2"), nb, r, p)).as("pk"))
        .select(col("doc_id"), col("pk.bk").as("bk"),
          lit(p.toLong).as("probes"))
    }.reduce(_ unionAll _)
    val cand = probeKeys.as("x").join(corpusKeys.as("y"), "bk")
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .select(col("probes"),
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
      .localCheckpoint() // pair dedup + per-level stats read it
    val a = sig.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val b = sig.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    val ver = cand.select("doc_a", "doc_b").distinct()
      .join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        ((size(array_intersect(col("hs_a"), col("hs_b")))
          .cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) -
            size(array_intersect(col("hs_a"), col("hs_b"))))
          .cast("double")) >= 0.8).as("hit"))
    val truth = Dedup
      .nearDupPrefixArtifact(graft.Tables.documents(s, dir), "doc_id",
        "text", threshold = 0.8,
        fpKey = s"$dir#documents#neardup_prefix")
      .agg(count(lit(1)).as("n_true"))
    val perLevel = cand.join(broadcast(ver), Seq("doc_a", "doc_b"))
      .groupBy("probes")
      .agg(count(lit(1)).as("n_candidates"),
        sum(col("hit").cast("long")).as("n_verified"))
    import s.implicits._
    Seq(0L, 1L, 2L).toDF("probes")
      .join(broadcast(perLevel), Seq("probes"), "left")
      .crossJoin(broadcast(truth))
      .select(col("probes"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_verified"), lit(0L)).as("n_verified"),
        expr("(1000 * coalesce(n_verified, 0L)) div " +
          "greatest(n_true, 1L)").as("recall_milli"))
  }

  val defs: Seq[QDef] = Seq(

    QDef("q388_fact_sidecar_served",
      (s, _) => {
        val sink = new java.io.File(
          "target/fact_sidecar_sink").getAbsolutePath
        graft.ops.Fs.wipe(sink)
        val blocks = s.read.schema(BlockIngest.blockSchema)
          .json(s"${FixtureGen.FixtureDir}/stream/blocks.jsonl")
        // 4-block buckets so the 15-block lifecycle spans hb 0..3 —
        // the bucketed layout's whole point is O(#buckets) parts
        def serve() = ArtifactStore.buildOrServeParts(s,
          "txn_type_counts",
          BlockIngest.factParts(s, sink, "transactions"),
          "by=block,type", sourceKey = s"$sink/transactions") { pid =>
          BlockIngest.readFactPart(s, sink, "transactions", pid)
            .groupBy(col("block"), col("type"))
            .agg(count(lit(1)).as("n"))
        }
        BlockIngest.processBatch(s,
          blocks.filter(col("height").between(1L, 10L)), sink,
          bucketBlocks = Some(4L))
        serve().count() // builds the 3 committed buckets (hb 0..2)
        BlockIngest.processBatch(s,
          blocks.filter(col("height").between(11L, 15L)), sink)
        // delta re-serve: only the two dirtied buckets (hb=2 gains
        // block 11, hb=3 is new) rebuild; then a COMPACTION folds the
        // two slices of hb=2 — a fingerprint-invariant repack, so the
        // final serve is a pure multi-path parquet scan with ZERO
        // rebuilds over the compacted layout
        serve().count()
        BlockIngest.compactFacts(s, sink)
        serve().select(col("block"), col("type"), col("n"))
      },
      Some(s"""SELECT CAST(block AS BIGINT) AS block, type,
              |  CAST(count(*) AS BIGINT) AS n
              |FROM read_parquet(
              |  '${FixtureGen.FixtureDir}/transactions.parquet/*.parquet')
              |WHERE block <= 15
              |GROUP BY 1, 2""".stripMargin)),

    // Multi-probe MinHash near-dup (the r14 verdict #5 ask — q376's
    // query-side fan-out applied to the dedup band family): at the
    // deliberately recall-STARVED (3 bands × 8 rows) geometry — a
    // band matches only on 8 consecutive signature agreements, so
    // even 0.9-similar pairs miss all 3 bands ~18% of the time —
    // probe level p additionally looks up each band's p least-stable
    // perturbed keys (the slot whose runner-up hash sits closest to
    // its min — the slot where the partner's minimum most plausibly
    // hides, swapped for that runner-up). The corpus keeps ONE key
    // per band; recall rises with p at fixed index storage, measured
    // against the prefix-join full-recall truth. The oracle replays
    // probe generation literally — runner-up signatures, gap-ordered
    // flip choice, both probe directions (the q140 lesson: never
    // oracle a sampled/probed shape with "trust the op").
    QDef("q389_neardup_multiprobe",
      (s, dir) => multiProbeNearDup(s, dir) { sig =>
        sig.select(col("doc_id"),
          explode(graft.ops.Dedup.bandKeyArray(col("mh"),
            MultiProbeNearDupSql.nb, MultiProbeNearDupSql.r)).as("bk"))
      },
      Some(MultiProbeNearDupSql.sql)),
    // The full artifact-lifecycle audit in ONE frame (the r14 verdict
    // #8a frontier): q371 reads what IS committed (manifests), q387
    // reads what each resolution DID (the serve log) — this joins
    // them. A scripted lifecycle drives BOTH artifact shapes against
    // a dedicated root: a monolithic artifact (build → hit → corpus
    // rebuild that vacuums the superseded address → hit) and a
    // part-addressed one (parts build → pure serve → one-part append
    // → serve), then the query full-outer-joins the store's commit
    // records with its event log per (name, fingerprint): which
    // addresses are LIVE, how often each was built/served, and which
    // were vacuumed (live=false, n_vacuum>0 — retention visible next
    // to the commit it superseded). Both engines read the same files
    // independently. Single-threaded-driver scope as q383-q387.
    QDef("q390_artifact_lifecycle",
      (s, dir) => {
        val root = new java.io.File(
          "target/artifacts_gov_life").getAbsolutePath
        graft.ops.Fs.wipe(root)
        val prev = s.conf.getOption(ArtifactStore.RootConf)
        try {
          s.conf.set(ArtifactStore.RootConf, root)
          val nat = Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))
          val key = s"$dir#nation#govlife"
          val fpA = ArtifactStore.fingerprint(nat, s"$key#a")
          // monolithic: build, hit, corpus rebuild (vacuums fpA), hit
          ArtifactStore.buildOrServe(s, "life_mono", fpA, "p=1", key)(nat)
          ArtifactStore.buildOrServe(s, "life_mono", fpA, "p=1", key)(nat)
          val nat2 = nat.filter(col("n_nationkey") =!= 0)
          val fpB = ArtifactStore.fingerprint(nat2, s"$key#b")
          ArtifactStore.buildOrServe(s, "life_mono", fpB, "p=1", key)(nat2)
          ArtifactStore.buildOrServe(s, "life_mono", fpB, "p=1", key)(nat2)
          // part-addressed: 2 parts build, pure serve, append a third,
          // serve again — per-part builds and aggregated events land
          def parts(ps: Seq[(String, String)]) =
            ArtifactStore.buildOrServeParts(s, "life_parts", ps,
              "p=1", key) { pid =>
              nat.filter(col("n_nationkey") % 3 ===
                pid.drop(1).toInt)
            }.count()
          val p12 = Seq("g0" -> "fp_g0", "g1" -> "fp_g1")
          parts(p12); parts(p12)
          parts(p12 :+ ("g2" -> "fp_g2"))
        } finally prev match {
          case Some(r) => s.conf.set(ArtifactStore.RootConf, r)
          case None => s.conf.unset(ArtifactStore.RootConf)
        }
        LifecycleOracle.sql = Some(
          s"""WITH m AS (SELECT name, fingerprint, true AS live
             |  FROM read_json_auto('$root/**/manifest.json')),
             |e AS (SELECT name, fingerprint, action
             |  FROM read_json_auto('$root/_serve_log/*.jsonl')),
             |g AS (SELECT name, fingerprint,
             |    CAST(sum(CASE WHEN action = 'build' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_build,
             |    CAST(sum(CASE WHEN action = 'serve' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_serve,
             |    CAST(sum(CASE WHEN action = 'vacuum' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_vacuum
             |  FROM e GROUP BY 1, 2)
             |SELECT name, fingerprint, coalesce(live, false) AS live,
             |  coalesce(n_build, 0) AS n_build,
             |  coalesce(n_serve, 0) AS n_serve,
             |  coalesce(n_vacuum, 0) AS n_vacuum
             |FROM m FULL JOIN g USING (name, fingerprint)""".stripMargin)
        val manifests = s.read
          .schema("name STRING, fingerprint STRING, params STRING, " +
            "payload STRING")
          .json(s"$root/*/*/*/manifest.json",
            s"$root/*/*/*/*/*/manifest.json")
          .select(col("name"), col("fingerprint"), lit(true).as("live"))
        val events = s.read
          .schema("seq LONG, name STRING, fingerprint STRING, " +
            "params STRING, action STRING, parts LONG, built LONG")
          .json(s"$root/_serve_log/*.jsonl")
          .groupBy(col("name"), col("fingerprint"))
          .agg(
            sum(when(col("action") === "build", 1L).otherwise(0L))
              .as("n_build"),
            sum(when(col("action") === "serve", 1L).otherwise(0L))
              .as("n_serve"),
            sum(when(col("action") === "vacuum", 1L).otherwise(0L))
              .as("n_vacuum"))
        manifests.join(events, Seq("name", "fingerprint"), "full_outer")
          .select(col("name"), col("fingerprint"),
            coalesce(col("live"), lit(false)).as("live"),
            coalesce(col("n_build"), lit(0L)).as("n_build"),
            coalesce(col("n_serve"), lit(0L)).as("n_serve"),
            coalesce(col("n_vacuum"), lit(0L)).as("n_vacuum"))
      },
      None,
      Some(() => LifecycleOracle.sql)),

    // IVF-PQ SERVED (the r14 verdict #8b frontier): q89 builds its
    // coarse-routed residual codes inline on every run; here the
    // (vec_id, cell, codes) table is a write-once artifact addressed
    // by the corpus fingerprint — the q372 serve discipline applied
    // one index family over. The build CLUSTERS the codes by cell
    // (repartition + sortWithinPartitions) so the served parquet's
    // row groups are cell-pure and the query's 8-of-16 cell probe
    // prunes at the scan (the 100 TB read path: probed fraction of a
    // codes table 32x smaller than the corpus, then 50 raw-vector
    // point lookups for the exact re-rank). Same seeds, assignment
    // rule, and ADC math as q89 — bit-identical rows, same oracle
    // generator (Pipeline76Spec pins q391 == q89 inline AND served).
    QDef("q391_ann_ivfpq_served",
      (s, dir) => {
        import graft.ops.VectorSearch._
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val coarse = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        def cosD(a: Array[Double], b: Array[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          d / (math.sqrt(na) * math.sqrt(nb))
        }
        val resSample = sample.map { v =>
          val ci = coarse.indices.maxBy(i => (cosD(v, coarse(i)), i))
          Array.tabulate(v.length)(d => v(d) - coarse(ci)(d))
        }
        val codebook = pqTrain(resSample, m = 8, k = 16, iters = 10,
          seed = 43)
        IvfPqServedOracle.sql = Some(VectorQueries.ivfPqOracleSql(
          coarse, codebook, probes = 8, topK = 10))
        val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
        val fpKey = s"$dir#embeddings#ivfpq"
        val cbh = ArtifactStore.contentHash(
          (coarse.map(_.mkString(",")) ++
            codebook.map(_.map(_.mkString(",")).mkString(";"))).mkString("|"))
        // inline (no root): checkpoint — the encode subtree feeds the
        // shortlist twice; served: a parquet scan, re-reading is free
        val codes =
          if (ArtifactStore.root(s).isEmpty)
            buildCodes(s, dir, coarse, codebook).localCheckpoint()
          else ArtifactStore.buildOrServe(s, "ivfpq_codes",
            ArtifactStore.fingerprint(
              emb.select(col("vec_id"), col("embedding")), fpKey),
            s"cb=$cbh,m=8,k=16,res", fpKey)(
            buildCodes(s, dir, coarse, codebook))
        // the probed cells as DRIVER LITERALS (an O(probes)=8-value
        // collect, justified: one query row against a 16-cell map):
        // an `isin` literal reaches the artifact scan as a pushed
        // filter, so the sorted-by-cell row groups PRUNE — a join
        // could only filter after the read. At 100 TB this is the
        // difference between scanning nprobe/k of the codes table and
        // scanning all of it.
        val qCells = ivfAssign(emb.filter(col("vec_id") === 0),
            "vec_id", "embedding", coarse, probes = 8)
          .select(col("cell")).distinct()
          .collect().map(_.get(0))
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        val recon = pqRecon((0 until 8).map(i => col(s"c$i")), codebook)
        val short = codes.filter(col("vec_id") =!= 0)
          .filter(col("cell").isin(qCells: _*))
          .withColumn("cc", element_at(coarseLit, col("cell") + 1))
          .withColumn("approx", vecAdd(col("cc"), recon))
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("approx"), col("qv")), 6).as("approx_sim"))
          .orderBy(col("approx_sim").desc, col("vec_id").asc)
          .limit(50)
          .select(col("vec_id"))
        short.join(e, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("sim").desc, col("vec_id").asc)))
      },
      None,
      Some(() => IvfPqServedOracle.sql)))

  /** q391's served codes table: IVF cell (probes=1 argmax assignment,
    * q89's rule) + PQ codes of the RESIDUAL v − c_cell, clustered by
    * cell so the artifact's row groups prune under a cell probe. */
  private def buildCodes(s: org.apache.spark.sql.SparkSession,
                         dir: String, coarse: Array[Array[Double]],
                         codebook: Array[Array[Array[Double]]])
      : org.apache.spark.sql.DataFrame = {
    import graft.ops.VectorSearch._
    val emb = Tables.embeddings(s, dir)
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    e.join(ivfAssign(emb, "vec_id", "embedding", coarse, probes = 1)
        .withColumnRenamed("id", "vec_id"), "vec_id")
      .withColumn("cc", element_at(coarseLit, col("cell") + 1))
      .select(col("vec_id"), col("cell"),
        pqEncodeKernel(vecSub(col("v"), col("cc")), codebook).as("codes"))
      .select(Seq(col("vec_id"), col("cell")) ++ (0 until 8)
        .map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
      .repartition(col("cell"))
      .sortWithinPartitions("cell")
  }

  /** q391's late-bound oracle (coarse + codebook literals — q89's
    * generator, own slot so a filtered Verify run stands alone). */
  private object IvfPqServedOracle {
    @volatile var sql: Option[String] = None
  }

  /** q390's late-bound oracle (embeds the governance-root path). */
  private object LifecycleOracle { @volatile var sql: Option[String] = None }
}

/** q389's oracle, generated: replays the (8×3) MinHash geometry, the
  * runner-up signatures, the gap-ordered flip choice, and both probe
  * directions in DuckDB SQL. Factored out so the generation stays
  * readable next to the QDef. */
private[queries] object MultiProbeNearDupSql {
  import graft.functions.TextAnalysis.{MinhashPrime, affineParam}

  val nb = 3; val r = 8; private val nh = nb * r

  lazy val sql: String = {
    def affine(j: Int) = {
      val (aa, bb) = affineParam(j)
      s"list_transform(sh, h -> (h * $aa + $bb) % $MinhashPrime)"
    }
    val mins = (0 until nh).map(j => s"list_min(${affine(j)})")
      .mkString("[", ",\n    ", "]")
    // runner-up per seed, multiset semantics (list_sort keeps
    // duplicates); a single-shingle doc's runner-up is its min — the
    // kernel's exact contract
    val mins2 = (0 until nh).map { j =>
      s"coalesce(list_sort(${affine(j)})[2], list_min(${affine(j)}))"
    }.mkString("[", ",\n    ", "]")
    // per band k: the flip slots, ordered by (runner-up − min) gap
    // then slot — DuckDB's list_sort on (g, s) structs is the same
    // lexicographic ascending order as the op's array_sort
    def g(k: Int, s: Int) = s"(sig2[${k * r + s + 1}] - sig[${k * r + s + 1}])"
    val flips = (0 until nb).flatMap { k =>
      val gaps = (0 until r)
        .map(s => s"{'g': ${g(k, s)}, 's': $s}")
        .mkString("[", ", ", "]")
      Seq(s"list_sort($gaps)[1].s AS f1_$k",
        s"list_sort($gaps)[2].s AS f2_$k")
    }.mkString(",\n    ")
    def slotIdx(k: Int, s: Int) = k * r + s + 1
    def baseMatch(k: Int) = (0 until r).map(s =>
      s"a.sig[${slotIdx(k, s)}] = b.sig[${slotIdx(k, s)}]")
      .mkString("(", " AND ", ")")
    def probeMatch(x: String, y: String, f: String, k: Int) =
      (0 until r).map { s =>
        s"(CASE WHEN $x.${f}_$k = $s THEN $x.sig2[${slotIdx(k, s)}] " +
          s"ELSE $x.sig[${slotIdx(k, s)}] END) = $y.sig[${slotIdx(k, s)}]"
      }.mkString("(", " AND ", ")")
    val l0 = (0 until nb).map(baseMatch).mkString("(", " OR\n      ", ")")
    def lvl(f: String) = (0 until nb).flatMap(k => Seq(
      probeMatch("a", "b", f, k), probeMatch("b", "a", f, k)))
      .mkString("(", " OR\n      ", ")")
    val rows = Seq(0, 1, 2).map { p =>
      val flag = (0 to p).map {
        case 0 => "l0"; case 1 => "l1x"; case 2 => "l2x" }
        .mkString("(", " OR ", ")")
      s"""SELECT CAST($p AS BIGINT) AS probes,
         |  CAST(sum(CASE WHEN $flag THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_candidates,
         |  CAST(sum(CASE WHEN $flag AND hit THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_verified
         |FROM c""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x != '') AS toks
       |  FROM documents),
       |s AS (SELECT doc_id, list_distinct(list_transform(
       |    CASE WHEN len(toks) >= 3 THEN
       |      list_transform(generate_series(1, len(toks) - 2),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE [] END,
       |    g -> cast('0x' || substr(md5(g), 1, 8) as bigint))) AS sh
       |  FROM t),
       |m AS MATERIALIZED (SELECT doc_id, sh, $mins AS sig,
       |    $mins2 AS sig2
       |  FROM s WHERE len(sh) > 0),
       |mf AS MATERIALIZED (SELECT *,
       |    $flips
       |  FROM m),
       |c AS MATERIALIZED (SELECT
       |    len(list_intersect(a.sh, b.sh))::DOUBLE /
       |      (len(a.sh) + len(b.sh) -
       |       len(list_intersect(a.sh, b.sh))) >= 0.8 AS hit,
       |    $l0 AS l0,
       |    ${lvl("f1")} AS l1x,
       |    ${lvl("f2")} AS l2x
       |  FROM mf a JOIN mf b ON a.doc_id < b.doc_id),
       |tr AS (SELECT CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_true FROM c),
       |u AS ($rows)
       |SELECT probes, n_candidates, n_verified,
       |  (1000 * n_verified) // greatest(tr.n_true, 1) AS recall_milli
       |FROM u CROSS JOIN tr""".stripMargin
  }
}
