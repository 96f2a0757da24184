package graft.queries

import graft.Tables
import graft.ops.{ArtifactStore, VectorSearch}
import graft.streaming.{StreamIvfIndex, StreamLshIndex, StreamMinhashIndex,
  StreamSimhashIndex, StreamWinnowIndex}
import org.apache.spark.sql.functions._

/** Eightieth pipeline group — the maintained-index REGISTRY: every
  * pinned maintained store's operational surface (identity pin,
  * watermark, committed part count, sidecar-folded fingerprint) in
  * ONE frame, audited by two engines reading the SAME files
  * independently. q371/q378/q387/q390 audit the ARTIFACT side of the
  * lifecycle; this audits the STORE side — the thing a fleet operator
  * lists before trusting a serve tier: which indexes exist, under
  * which identity, applied through which batch, folding to which
  * content address.
  *
  *  - q397: drives one store of each pinned family (MinHash bands,
  *    sign-LSH, IVF postings, winnow fingerprints, SimHash
  *    signatures — a mid-life compaction on the LSH store so the
  *    registry sees a rollup part) plus a PLANTED TORN BATCH:
  *    a `bid=99` sidecar written with no watermark move. Both engines
  *    must exclude it — the Spark side through the store protocol's
  *    committed-part filter, the oracle by joining the sidecar list
  *    against `meta.txt` itself. The fingerprint column is the
  *    protocol's actual fold (Σ part sums mod 2⁶⁴ over committed
  *    sidecars, decimal), so the oracle re-derives the content
  *    address from raw sidecar JSON — the fold arithmetic itself is
  *    cross-engine checked, not trusted.
  *
  * CONCURRENCY SCOPE: drives fixed `target/` store paths — correct
  * under the strictly-single-threaded driver contract (see
  * [[PipelineQueries75]]'s scope note).
  */
object PipelineQueries80 {

  private val Mod64 = BigInt(2).pow(64)

  /** q397's late-bound oracle (embeds the absolute store paths). */
  private object RegistryOracle {
    @volatile var sql: Option[String] = None
  }

  /** q403's late-bound oracle (embeds the store + artifact roots). */
  private object StalenessOracle {
    @volatile var sql: Option[String] = None
  }

  /** One registry row from the STORE PROTOCOL's own reads: watermark
    * from meta, committed sidecars only, the canonical fold. */
  private def registryRow(store: String, identity: String,
                          dirPath: String, applied: Long)
      : (String, String, Long, Long, String, Long) = {
    // the bid parse fails LOUDLY naming the entry (the
    // DeltaPartsStore.bidOf rule): a foreign `bid=tmp` sidecar must
    // not surface as a bare NumberFormatException deep in the filter
    val parts = ArtifactStore.readFpParts(s"$dirPath/parts",
      p => p.startsWith("bid=") && (p.drop(4).toLongOption match {
        case Some(b) => b <= applied
        case None => throw new IllegalStateException(
          s"unparseable part id '$p' under $dirPath/parts — expected " +
            "bid=<long>")
      }))
    val sum = parts.map(_._2._1)
      .foldLeft(BigInt(0))((a, b) => (a + b).mod(Mod64))
    (store, identity, applied, parts.size.toLong,
      sum.toString, parts.map(_._2._2).sum)
  }

  /** One store's oracle CTE pair + SELECT leg. */
  private def storeSql(store: String, dirPath: String,
                       identitySql: String): (String, String) = {
    val ctes =
      s"""m_$store AS (SELECT CAST(trim(content) AS BIGINT) AS applied
         |  FROM read_text('$dirPath/meta.txt')),
         |f_$store AS (SELECT CAST(sum AS HUGEINT) AS s,
         |    CAST(n AS BIGINT) AS n
         |  FROM read_json_auto('$dirPath/parts/_fp/*.json'), m_$store
         |  WHERE CAST(replace(part, 'bid=', '') AS BIGINT)
         |    <= m_$store.applied)""".stripMargin
    val leg =
      s"""SELECT '$store' AS store, $identitySql AS identity,
         |  (SELECT applied FROM m_$store) AS applied_bid,
         |  (SELECT CAST(count(*) AS BIGINT) FROM f_$store) AS n_parts,
         |  (SELECT CAST(sum(s) %
         |     CAST('18446744073709551616' AS HUGEINT) AS VARCHAR)
         |   FROM f_$store) AS fp_sum,
         |  (SELECT CAST(sum(n) AS BIGINT) FROM f_$store) AS n_rows""".stripMargin
    (ctes, leg)
  }

  val defs: Seq[QDef] = Seq(

    QDef("q397_index_registry",
      (s, dir) => {
        val mh = new java.io.File("target/registry_minhash").getAbsolutePath
        val lsh = new java.io.File("target/registry_lsh").getAbsolutePath
        val ivf = new java.io.File("target/registry_ivf").getAbsolutePath
        val win = new java.io.File("target/registry_winnow").getAbsolutePath
        val sim = new java.io.File(
          "target/registry_simhash").getAbsolutePath
        Seq(mh, lsh, ivf, win, sim).foreach(graft.ops.Fs.wipe)
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        // MinHash bands: two arrival batches
        Seq(0, 1).foreach { b =>
          StreamMinhashIndex.applyBatch(
            docs.where(pmod(col("doc_id"), lit(2)) === b), b.toLong,
            "doc_id", "text", 12, 2, mh)
        }
        // a TORN batch: sidecar present, watermark never moved — both
        // engines must leave it out of the registry row
        ArtifactStore.writeFpPart(s"$mh/parts", "bid=99",
          (BigInt(123456789), 45L))
        // sign-LSH: three batches with a mid-life compaction, so the
        // registry sees the rollup part under the same watermark
        Seq(0, 1, 2).foreach { b =>
          StreamLshIndex.applyBatch(
            emb.where(pmod(col("vec_id"), lit(3)) === b), b.toLong,
            "vec_id", "embedding", 4, 4, 64, lsh)
        }
        StreamLshIndex.compact(s, lsh)
        // IVF postings: two batches under a trained matrix
        val cents = VectorSearch.kmeansCentroids(
          VectorSearch.sampleVectors(emb, "vec_id", "embedding",
            n = 256, seed = 7),
          k = 8, iters = 5, seed = 7)
        Seq(0, 1).foreach { b =>
          StreamIvfIndex.applyBatch(
            emb.where(pmod(col("vec_id"), lit(2)) === b), b.toLong,
            "vec_id", "embedding", cents, 2, ivf)
        }
        // winnow fingerprints: two arrival batches (its (k, w) pin
        // rides module constants — the registry shows the pin FILE)
        Seq(0, 1).foreach { b =>
          StreamWinnowIndex.applyBatch(
            docs.where(pmod(col("doc_id"), lit(2)) === b), b.toLong,
            "doc_id", "text", win)
        }
        // simhash signatures: two arrival batches
        Seq(0, 1).foreach { b =>
          StreamSimhashIndex.applyBatch(
            docs.where(pmod(col("doc_id"), lit(2)) === b), b.toLong,
            "doc_id", "text", sim)
        }
        // identity strings come off the PIN ACCESSORS (the engine
        // path); the oracle re-reads the pin files raw
        val mhId = StreamMinhashIndex.geometry(mh)
          .map { case (b, r) => s"bands=$b,rowsPerBand=$r" }.get
        val lshId = StreamLshIndex.geometry(lsh)
          .map { case (b, bb, d) => s"bands=$b,bitsPerBand=$bb,dims=$d" }
          .get
        val ivfId = StreamIvfIndex.centroids(ivf)
          .map { case (m, pr) => s"probes=$pr,k=${m.length}," +
            s"dims=${m.head.length}" }.get
        val winId = StreamWinnowIndex.geometry(win)
          .map { case (k, w) => s"k=$k,w=$w" }.get
        val simId = StreamSimhashIndex.geometry(sim)
          .map { case (b, k) => s"bits=$b,blocks=$k" }.get
        val (mc, ml) = storeSql("minhash", mh,
          s"(SELECT trim(content) FROM read_text('$mh/geometry.txt'))")
        val (lc, ll) = storeSql("lsh", lsh,
          s"(SELECT trim(content) FROM read_text('$lsh/geometry.txt'))")
        val (ic, il) = storeSql("ivf", ivf,
          s"(SELECT split_part(content, chr(10), 1) " +
            s"FROM read_text('$ivf/centroids.txt'))")
        val (wc, wl) = storeSql("winnow", win,
          s"(SELECT trim(content) FROM read_text('$win/geometry.txt'))")
        val (hc, hl) = storeSql("simhash", sim,
          s"(SELECT trim(content) FROM read_text('$sim/geometry.txt'))")
        RegistryOracle.sql = Some(
          s"""WITH $mc,
             |$lc,
             |$ic,
             |$wc,
             |$hc
             |$ml
             |UNION ALL
             |$ll
             |UNION ALL
             |$il
             |UNION ALL
             |$wl
             |UNION ALL
             |$hl
             |ORDER BY store""".stripMargin)
        import s.implicits._
        Seq(
          registryRow("minhash", mhId, mh,
            StreamMinhashIndex.appliedBid(mh)),
          registryRow("lsh", lshId, lsh, StreamLshIndex.appliedBid(lsh)),
          registryRow("ivf", ivfId, ivf, StreamIvfIndex.appliedBid(ivf)),
          registryRow("winnow", winId, win,
            StreamWinnowIndex.appliedBid(win)),
          registryRow("simhash", simId, sim,
            StreamSimhashIndex.appliedBid(sim)))
          .toDF("store", "identity", "applied_bid", "n_parts",
            "fp_sum", "n_rows")
          .orderBy("store")
      },
      None,
      Some(() => RegistryOracle.sql)),

    // The registry-driven STALENESS audit (the freshness question
    // q397 and q371 each answer half of): which committed artifacts
    // still match their source store's CURRENT content address? The
    // serve path answers this implicitly (a stale address rebuilds on
    // the next serve); this makes it QUERYABLE for artifacts nobody
    // has re-served — the fleet-operator question "what would rebuild
    // if swept right now". A monolithic rollup builds over the
    // maintained store, the store moves on (one more batch, NOT
    // re-served — now stale), a sibling builds after the append
    // (current). Both engines derive "current" independently — the
    // Spark side through the store protocol's sidecar fold, the
    // oracle by re-deriving the FOLD AND ITS 16-HEX FORMAT from raw
    // sidecar JSON (combineParts replayed literally, hex and all) —
    // and read the same manifests. Single-threaded-driver scope.
    QDef("q403_artifact_staleness",
      (s, dir) => {
        val store = new java.io.File(
          "target/staleness_minhash").getAbsolutePath
        val root = new java.io.File(
          "target/artifacts_staleness").getAbsolutePath
        Seq(store, root).foreach(graft.ops.Fs.wipe)
        val docs = Tables.documents(s, dir)
        Seq(0, 1).foreach { b =>
          StreamMinhashIndex.applyBatch(
            docs.where(pmod(col("doc_id"), lit(3)) === b), b.toLong,
            "doc_id", "text", 12, 2, store)
        }
        val prev = s.conf.getOption(ArtifactStore.RootConf)
        val fpNow =
          try {
            s.conf.set(ArtifactStore.RootConf, root)
            def rollup(name: String) = ArtifactStore.buildOrServe(s,
              name, StreamMinhashIndex.storeFingerprint(store),
              "agg=perdoc", s"$store#$name")(
              StreamMinhashIndex.keys(s, store)
                .groupBy(col("doc_id"))
                .agg(count(lit(1)).as("n_keys")))
            rollup("minhash_rollup").count() // built at the 2-batch address
            // the store moves on; the rollup is NOT re-served → stale
            StreamMinhashIndex.applyBatch(
              docs.where(pmod(col("doc_id"), lit(3)) === 2), 2L,
              "doc_id", "text", 12, 2, store)
            rollup("minhash_rollup_fresh").count() // current by construction
            StreamMinhashIndex.storeFingerprint(store)
          } finally prev match {
            case Some(r) => s.conf.set(ArtifactStore.RootConf, r)
            case None => s.conf.unset(ArtifactStore.RootConf)
          }
        val mod = "CAST('18446744073709551616' AS HUGEINT)"
        val hsum = s"(sum(s2) % $mod)"
        StalenessOracle.sql = Some(
          s"""WITH m AS (SELECT CAST(trim(content) AS BIGINT) AS applied
             |  FROM read_text('$store/meta.txt')),
             |f AS (SELECT CAST(sum AS HUGEINT) AS s2,
             |    CAST(n AS BIGINT) AS n
             |  FROM read_json_auto('$store/parts/_fp/*.json'), m
             |  WHERE CAST(replace(part, 'bid=', '') AS BIGINT)
             |    <= m.applied),
             |cur AS (SELECT
             |  lower(lpad(to_hex(CAST($hsum // 4294967296 AS BIGINT)),
             |      8, '0') ||
             |    lpad(to_hex(CAST($hsum % 4294967296 AS BIGINT)),
             |      8, '0')) || '_' || CAST(sum(n) AS VARCHAR) AS fp
             |  FROM f)
             |SELECT name, fingerprint,
             |  CAST(fingerprint = cur.fp AS BIGINT) AS is_current
             |FROM read_json_auto('$root/*/*/*/manifest.json'), cur
             |ORDER BY name""".stripMargin)
        s.read.schema("name STRING, fingerprint STRING")
          .json(s"$root/*/*/*/manifest.json")
          .select(col("name"), col("fingerprint"),
            (col("fingerprint") === lit(fpNow)).cast("long")
              .as("is_current"))
          .orderBy("name")
      },
      None,
      Some(() => StalenessOracle.sql)))
}
