package graft.queries

import graft.Tables
import graft.functions.TextAnalysis.{gramHashesPositional, tokenHash, tokens}
import graft.ops.{ArtifactStore, Decontaminate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seventy-fifth pipeline group — the write-once artifact operating
  * model extended to the two families that still re-derived their
  * corpus-side state inside every query: decontamination (the winnow
  * index) and LM scoring (the n-gram count tables). The same
  * build-vs-serve split the r13 layer gave ANN graphs and tokenizers
  * (maintain once, serve many — the reference's trigger-maintained
  * inventory instinct, migrations/1590689602-gateway_inventory.sql:64).
  *
  *  - q381: q93's decontamination flags SERVED from the `winnow_fps`
  *    artifact (q92's rows, which now commit through
  *    [[graft.ops.Decontaminate.fingerprintsArtifact]]): both the
  *    bench fingerprint set and the corpus probe side read the
  *    committed (doc_id, fp) parquet — with a root configured the
  *    query never tokenizes the corpus. Same rows as q93 bit-for-bit
  *    (Pipeline75Spec pins it).
  *
  *  - q382: q108's bigram-LM mean NLL with the MODEL served: the
  *    bigram and prefix count tables are write-once artifacts
  *    addressed by the corpus content fingerprint, and the smoothing
  *    vocabulary size is the prefix table's row count (no third
  *    artifact). The probe side still streams the corpus — scoring IS
  *    per-token work — but the two count-table shuffles and the
  *    distinct are gone from the steady state. Same rows as q108
  *    (spec-pinned).
  *
  *  - q383: the maintained winnow index under an ORACLE (q380's
  *    pattern, index edition): three interleaved arrival slices + a
  *    mid-life repack compaction, and the folded view must equal
  *    DuckDB's single-shot winnow of the corpus — per-doc fingerprint
  *    count and extremes. Exactness is structural: fingerprints are
  *    per-doc, so the union fold is slicing-invariant (the property
  *    the NSW store honestly cannot claim).
  *
  *  - q384: the full loop — decontamination flags computed from the
  *    MAINTAINED index served through the part-addressed artifact path
  *    ([[graft.streaming.StreamWinnowIndex.servedFps]]): batches
  *    arrive, the store compacts mid-life, a later batch appends, and
  *    the decon answer over the served index must equal q93's
  *    single-shot answer. Streaming maintenance, artifact serving, and
  *    the decon probe audited as one contract.
  *
  *  - q385: the maintained count store as the unigram LM — q78's
  *    frequency table derived from [[graft.streaming
  *    .StreamTokenCounts]]'s folded view (arrivals + mid-life merge
  *    compaction), scored against q78's oracle verbatim: the
  *    materialized view feeds the model, additivity makes it exact.
  *
  *  - q386: multi-probe ANN over the MAINTAINED LSH index
  *    ([[graft.streaming.StreamLshIndex]] — the q384 loop, ANN
  *    edition): vectors arrive in batches, the bucket store compacts
  *    mid-life and appends after, the index serves part-addressed
  *    through the artifact store, and the q376 multi-probe answer over
  *    it must equal the single-shot oracle replay. Per-vector keys
  *    make the maintained index exact; multi-probe needs no store
  *    cooperation (the query side fans out, the corpus keeps one key
  *    per band forever).
  *
  *  - q387: the artifact store's serve LOG under an oracle — the
  *    build/hit/vacuum history as queryable rows (manifests say what
  *    IS committed; the log says what each resolution DID), both
  *    engines reading the same `_serve_log` JSONL independently.
  *
  * CONCURRENCY SCOPE: q383–q387 drive fixed `target/` store paths and
  * q387 additionally redirects the SESSION-WIDE artifact root to a
  * scratch dir it wipes. Both are correct under the driver contract —
  * Verify/Bench execute queries strictly one at a time on one session
  * — and would not be under a concurrent driver: a parallel query
  * could commit artifacts into the scratch root mid-wipe, or interleave
  * writes into a shared `target/` store. A concurrent harness must
  * give these lifecycle queries a cloned session (`spark.newSession`,
  * whose conf the redirect would then scope) and per-run store paths.
  */
object PipelineQueries75 {

  /** q387's late-bound oracle (embeds the governance-root path). */
  private object ServeLogOracle {
    @volatile var sql: Option[String] = None
  }

  val defs: Seq[QDef] = Seq(

    QDef("q381_winnow_decon_served",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val fps0 = Decontaminate.fingerprintsArtifact(docs, "doc_id",
          "text", fpKey = s"$dir#documents#id_text")
        // served: a parquet scan — re-reading twice is free; inline:
        // the tokenize+winnow subtree feeds bench AND probe, so cut it
        val fps = if (ArtifactStore.root(s).isEmpty) fps0.localCheckpoint()
          else fps0
        val bench = fps.filter(col("doc_id") % 31 === 0)
          .select(col("fp")).distinct()
        Decontaminate.flagFromIndex(
          docs.filter(col("doc_id") % 31 =!= 0).select(col("doc_id")),
          fps.filter(col("doc_id") % 31 =!= 0), bench)
      },
      // q93's oracle, shared by reference — the twin cannot drift
      Some(PipelineQueries4.winnowDeconOracleSql)),

    QDef("q382_bigram_nll_served",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val stream = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            gramHashesPositional(col("toks"), 2).as("g2arr"))
          .select(col("doc_id"), col("toks"),
            posexplode_outer(col("g2arr")).as(Seq("pos", "g2")))
          .filter(col("g2").isNotNull)
          .select(col("doc_id"), col("g2"),
            tokenHash(element_at(col("toks"), col("pos") + 1)).as("h1"))
          .localCheckpoint() // the probe side; inline it also feeds both tables
        val fpKey = s"$dir#documents#id_text"
        def artifactOr(name: String)(b: => DataFrame) =
          if (ArtifactStore.root(s).isEmpty) b
          else ArtifactStore.buildOrServe(s, name,
            ArtifactStore.fingerprint(
              docs.select(col("doc_id"), col("text")), fpKey),
            "n=2,add1", fpKey)(b)
        val c2 = artifactOr("bigram_lm_c2")(
          stream.groupBy("g2").agg(count(lit(1)).as("c2")))
        val c1 = artifactOr("bigram_lm_c1")(
          stream.groupBy("h1").agg(count(lit(1)).as("c1")))
        // |V| = the prefix table's cardinality — served it's a
        // parquet-count over the artifact, never a corpus distinct
        val vDf = c1.agg(count(lit(1)).as("v"))
        val scored = stream
          .join(c2, "g2").join(c1, "h1")
          .crossJoin(broadcast(vDf))
          .withColumn("mnat", floor(lit(1000.0) * log(
            (col("c2").cast("double") + 1.0) /
              (col("c1").cast("double") + col("v").cast("double"))))
            .cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("mnat")).as("smnat"))
          .withColumn("mean_nll",
            round((-col("smnat")).cast("double") /
              col("n_bigrams").cast("double") / lit(1000.0), 6))
        docs.select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("mean_nll"), lit(0.0)).as("mean_nll"))
      },
      // q108's oracle, shared by reference — the twin cannot drift
      Some(PipelineQueries6.bigramNllOracleSql)),

    QDef("q383_stream_winnow_audit",
      (s, dir) => {
        val store = new java.io.File(
          "target/stream_winnow_audit").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        (0 until 3).foreach { b =>
          graft.streaming.StreamWinnowIndex.applyBatch(
            docs.where(pmod(col("doc_id"), lit(3)) === b), b.toLong,
            "doc_id", "text", store)
        }
        // repack-compaction mid-audit: the fold must not notice
        graft.streaming.StreamWinnowIndex.compact(s, store)
        graft.streaming.StreamWinnowIndex.fps(s, store)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_fps"),
            min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"))
      },
      // built on q92/q93's shared index CTEs — one winnow contract
      Some(s"""WITH ${PipelineQueries4.winnowIndexCtesSql}
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
              |  min(fp) AS min_fp, max(fp) AS max_fp
              |FROM f GROUP BY doc_id""".stripMargin)),

    QDef("q384_decon_maintained_served",
      (s, dir) => {
        val store = new java.io.File(
          "target/stream_winnow_serve").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val docs = Tables.documents(s, dir)
        val slim = docs.select(col("doc_id"), col("text"))
        // arrive in three batches with a mid-life compaction BETWEEN
        // appends — the served index must see pre-compaction rollup
        // parts and the post-compaction append as one part set
        graft.streaming.StreamWinnowIndex.applyBatch(
          slim.where(pmod(col("doc_id"), lit(3)) === 0), 0L,
          "doc_id", "text", store)
        graft.streaming.StreamWinnowIndex.applyBatch(
          slim.where(pmod(col("doc_id"), lit(3)) === 1), 1L,
          "doc_id", "text", store)
        graft.streaming.StreamWinnowIndex.compact(s, store)
        graft.streaming.StreamWinnowIndex.applyBatch(
          slim.where(pmod(col("doc_id"), lit(3)) === 2), 2L,
          "doc_id", "text", store)
        val fps = graft.streaming.StreamWinnowIndex.servedFps(s, store)
        val bench = fps.filter(col("doc_id") % 31 === 0)
          .select(col("fp")).distinct()
        Decontaminate.flagFromIndex(
          docs.filter(col("doc_id") % 31 =!= 0).select(col("doc_id")),
          fps.filter(col("doc_id") % 31 =!= 0), bench)
      },
      // q93's oracle again: same contract, different serving path
      Some(PipelineQueries4.winnowDeconOracleSql)),

    // The maintained count store IS the unigram LM: q78's frequency
    // table is exactly [[graft.streaming.StreamTokenCounts]]'s folded
    // view summed over sources, so the scorer can run off the
    // incrementally maintained store instead of re-counting the corpus
    // — the materialized-view-to-model hop, audited end to end: three
    // arrival slices + a mid-life merge compaction feed the store, and
    // the per-doc mean NLL must equal q78's single-shot answer (the
    // q78 oracle verbatim). The probe side still explodes the corpus —
    // scoring IS per-token work; what the store replaces is the
    // model-side count shuffle.
    QDef("q385_unigram_maintained_served",
      (s, dir) => {
        val store = new java.io.File(
          "target/stream_counts_lm").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val docs = Tables.documents(s, dir)
        (0 until 3).foreach { b =>
          graft.streaming.StreamTokenCounts.applyBatch(
            docs.where(pmod(col("doc_id"), lit(3)) === b), b.toLong,
            "source", "text", store)
        }
        graft.streaming.StreamTokenCounts.compact(s, store)
        val freq = graft.streaming.StreamTokenCounts.counts(s, store)
          .groupBy(col("token")).agg(sum(col("n")).as("cnt"))
          .select(col("token").as("tok"), col("cnt"))
        val totalDf = freq.agg(sum("cnt").as("total"))
        val vocab = freq.orderBy(col("cnt").desc, col("tok")).limit(50000)
        val toksDf = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        val p = when(col("cnt").isNotNull,
          col("total").cast("double") / col("cnt").cast("double"))
          .otherwise(col("total").cast("double") * 2.0) // OOV: p = 1/(2N)
        val scored = toksDf
          .join(broadcast(vocab), Seq("tok"), "left")
          .crossJoin(broadcast(totalDf))
          .withColumn("mnat", floor(lit(1000.0) * log(p)).cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            round(sum(col("mnat")).cast("double") /
              count(lit(1)).cast("double") / 1000.0, 6).as("mean_nll"))
        docs.select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("mean_nll"), lit(0.0)).as("mean_nll"))
      },
      // q78's oracle, shared by reference — the twin cannot drift
      Some(PipelineQueries.unigramLogprobOracleSql)),

    QDef("q386_multiprobe_maintained_served",
      (s, dir) => {
        import graft.ops.VectorSearch
        import graft.streaming.StreamLshIndex
        val store = new java.io.File(
          "target/stream_lsh_serve").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val emb = Tables.embeddings(s, dir)
        // arrivals in three slices, a mid-life compaction BETWEEN
        // appends — the served index sees the rollup + the late batch
        StreamLshIndex.applyBatch(
          emb.where(pmod(col("vec_id"), lit(3)) === 0), 0L,
          "vec_id", "embedding", 4, 4, 64, store)
        StreamLshIndex.applyBatch(
          emb.where(pmod(col("vec_id"), lit(3)) === 1), 1L,
          "vec_id", "embedding", 4, 4, 64, store)
        StreamLshIndex.compact(s, store)
        StreamLshIndex.applyBatch(
          emb.where(pmod(col("vec_id"), lit(3)) === 2), 2L,
          "vec_id", "embedding", 4, 4, 64, store)
        // the geometry-validated serve path: the probe fan-out below
        // derives keys under (4,4,64), so the read require-matches the
        // store pin before trusting any bucket key
        val buckets = StreamLshIndex.servedBuckets(s, store, 4, 4, 64)
        val e = emb.select(col("vec_id"),
          VectorSearch.toDouble(col("embedding")).as("v"))
        // query side: q376's multi-probe fan-out, verbatim
        val qProbe = e.filter(col("vec_id") === 0)
          .select(explode(VectorSearch.multiProbeKeys(col("v"),
            bands = 4, bitsPerBand = 4, dims = 64, extraProbes = 2))
            .as("pk"))
          .select(col("pk.band").as("band"),
            col("pk.key").cast("long").as("key"))
        val candIds = buckets.filter(col("id") =!= 0)
          .join(broadcast(qProbe), Seq("band", "key"))
          .select(col("id").as("vec_id")).distinct()
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        candIds.join(e, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(VectorSearch.cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("sim").desc, col("vec_id").asc)))
      },
      Some(LshSql.multiProbeTop5Sql)),

    // The artifact store's SERVE LOG under an oracle — the
    // observability leg q371/q378 cannot see: manifests record what IS
    // committed; the log records what each resolution DID. The query
    // drives a deterministic lifecycle against a dedicated root (build
    // → serve-hit → params-variant build → corpus-change rebuild that
    // VACUUMS the superseded sibling → serve-hit of the new address)
    // and reads the store's own event records back as rows; the oracle
    // reads the SAME file via read_json_auto — two engines audit the
    // build/hit/retention history independently. What the rows prove
    // queryable: per-sweep build-vs-serve ratios and every retention
    // deletion, each with the content address it acted on.
    QDef("q387_artifact_serve_log",
      (s, dir) => {
        val govRoot = new java.io.File(
          "target/artifacts_gov_log").getAbsolutePath
        graft.ops.Fs.wipe(govRoot)
        val prev = s.conf.getOption(ArtifactStore.RootConf)
        try {
          s.conf.set(ArtifactStore.RootConf, govRoot)
          val nat = Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))
          val key = s"$dir#nation#govlog"
          val fpA = ArtifactStore.fingerprint(nat, s"$key#a")
          ArtifactStore.buildOrServe(s, "govlog_demo", fpA, "p=1", key)(nat)
          ArtifactStore.buildOrServe(s, "govlog_demo", fpA, "p=1", key)(nat)
          ArtifactStore.buildOrServe(s, "govlog_demo", fpA, "p=2", key)(nat)
          val nat2 = nat.filter(col("n_nationkey") =!= 0)
          val fpB = ArtifactStore.fingerprint(nat2, s"$key#b")
          ArtifactStore.buildOrServe(s, "govlog_demo", fpB, "p=1", key)(nat2)
          ArtifactStore.buildOrServe(s, "govlog_demo", fpB, "p=1", key)(nat2)
        } finally prev match {
          case Some(r) => s.conf.set(ArtifactStore.RootConf, r)
          case None => s.conf.unset(ArtifactStore.RootConf)
        }
        ServeLogOracle.sql = Some(
          s"""SELECT seq, name, action, fingerprint
             |FROM read_json_auto(
             |  '$govRoot/_serve_log/*.jsonl')""".stripMargin)
        s.read
          .schema("seq LONG, name STRING, fingerprint STRING, " +
            "params STRING, action STRING")
          .json(s"$govRoot/_serve_log/*.jsonl")
          .select(col("seq"), col("name"), col("action"),
            col("fingerprint"))
      },
      None,
      Some(() => ServeLogOracle.sql)))
}
