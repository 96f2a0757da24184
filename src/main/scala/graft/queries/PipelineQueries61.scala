package graft.queries

import graft.Tables
import graft.ops.{ConnectedComponents, NswIndex, TopK}
import graft.ops.VectorSearch._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-first pipeline group — the round-12 frontier pair the r11
  * verdict suggested:
  *
  *  - q334: mergeable RANK-error quantile sketch + rank-error audit.
  *    The sketch family bounds relative VALUE error (q264 log-bucket)
  *    and q210 samples globally — what was missing is the mergeable
  *    rank path: per-source bottom-K sketches (K smallest corpus-wide
  *    hash values per source — an order-free, deterministic uniform
  *    sample, unlike KLL whose compaction is arrival-order-dependent
  *    and therefore NOT cross-engine replayable under the house
  *    determinism rule) whose UNION re-truncated to K provably EQUALS
  *    the corpus-direct bottom-K (a corpus-bottom row is in its own
  *    source's bottom-K — pigeonhole; Pipeline61Spec pins the
  *    identity). Quantiles read from the merged sketch; the audit
  *    reports each estimate's TRUE rank against the exact histogram —
  *    the rank-error number KLL would give, with O(K) mergeable state
  *    per source and no ordering assumptions. 100 TB: every source
  *    shard keeps K rows; merge is a union of S·K rows → K.
  *  - q335: DBSCAN-shape density clustering on the salt-capped kNN
  *    graph (q257's NswIndex.knnGraph — everything reused): core
  *    points have degree ≥ MinPts in the mutual-reachability graph,
  *    clusters are connected components of the CORE-CORE subgraph
  *    (star contraction, the q79 machinery), border points attach to
  *    their minimum-cluster adjacent core, the rest is noise. k-means
  *    partitions everything including outliers; DBSCAN's noise label
  *    is the missing piece for contamination screens. The graph build
  *    is the salt-capped linear construction; CC runs on the (small)
  *    core subgraph; no step is corpus-quadratic.
  */
object PipelineQueries61 {

  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  private val K = 256
  private val Ps = Seq(250L, 500L, 750L, 900L)

  private val MinPts = 4
  private val DbProbes = 2
  private val DbM = 6
  /** DBSCAN's eps, in rounded-cosine units: a neighbor counts toward
    * core density only at round(sim, 6) ≥ this. Without the radius,
    * a symmetrized top-m graph gives EVERY node degree ≥ m and the
    * role split degenerates to all-core (measured at sf0.01). 0.30 on
    * this corpus: ~55% cores, ~3% zero-neighbor noise at both SFs.
    */
  private val EpsMilli = 300L

  /** Late-bound centroid oracle for q335 (the NswOracle pattern). */
  /** q359's late-bound oracle — its own slot (a filtered Verify run
    * must not depend on q335 having populated anything). */
  private object DbscanServedOracle {
    @volatile var sql: Option[String] = None
  }

  private object DbscanOracle {
    @volatile var sql: Option[String] = None
  }

  private def dbl(x: Double): String = {
    val s = java.lang.Double.toString(x)
    if (s.contains("E") || s.contains("e"))
      java.math.BigDecimal.valueOf(x).toPlainString
    else s
  }

  val defs: Seq[QDef] = Seq(

    QDef("q334_rank_sketch_merge",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"), col("source"),
            graft.ops.Sketches.hash60(concat(lit("rs:"),
              col("doc_id").cast("string"))).as("h"))
          .localCheckpoint() // per-source sketches + exact histogram
        val n = docs.agg(count(lit(1)).as("n"))
        // stage 1: per-source bottom-K sketch (the state a 100 TB
        // source shard would keep)
        val perSrc = TopK.perGroup(docs, "source",
          struct(col("h"), col("doc_id"), col("n_chars")), K)
        // stage 2: MERGE = union of the per-source sketches,
        // re-truncated to the K smallest (== corpus-direct bottom-K;
        // identity spec-pinned)
        val merged = TopK.perGroup(perSrc.withColumn("g", lit(1L)), "g",
            struct(col("key.h").as("h"), col("key.doc_id").as("doc_id"),
              col("key.n_chars").as("n_chars")), K)
          .select(col("key.n_chars").as("v"), col("key.doc_id").as("d"))
          .localCheckpoint() // K rows; quantile picks + count share it
        val kc = merged.agg(count(lit(1)).as("kk"))
        val sv = merged.withColumn("rv",
          row_number().over(Window.orderBy(col("v"), col("d"))))
        val ps = typedLit(Ps)
        val sq = sv.crossJoin(broadcast(kc))
          .select(explode(ps).as("p"), col("rv"), col("v"), col("kk"))
          .filter(col("rv") === expr("(p * kk + 999) div 1000"))
          .select(col("p"), col("v").as("sketch_v"))
        // exact histogram: exact quantile + the TRUE rank of the
        // sketch estimate (the rank-error audit)
        val hist = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(Window.orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(n))
          .localCheckpoint() // O(distinct lengths); two probes read it
        val ex = hist
          .select(explode(ps).as("p"), col("n_chars"), col("cum"), col("n"))
          .filter(col("cum") >= expr("(p * n + 999) div 1000"))
          .groupBy("p").agg(min("n_chars").as("exact_v"))
        ex.join(sq, "p")
          .join(hist.select(col("n_chars").as("sketch_v"),
            col("cum"), col("n")), "sketch_v")
          .select(col("p").as("p_milli"), col("exact_v"), col("sketch_v"),
            expr("abs(cum * 1000 div n - p)").as("rank_err_milli"))
      },
      Some(s"""WITH d AS (SELECT doc_id, n_chars, source,
              |    ${hash60Sql("'rs:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |ps0 AS (SELECT * FROM (SELECT d.*, row_number() OVER (
              |    PARTITION BY source ORDER BY h, doc_id) AS rs
              |  FROM d) z WHERE rs <= $K),
              |m AS (SELECT n_chars AS v, doc_id AS dd FROM ps0
              |  ORDER BY h, doc_id LIMIT $K),
              |k AS (SELECT count(*) AS kk FROM m),
              |sv AS (SELECT v, row_number() OVER (ORDER BY v, dd)
              |    AS rv FROM m),
              |pp AS (SELECT unnest([${Ps.mkString(", ")}]) AS p),
              |sq AS (SELECT pp.p, sv.v AS sketch_v FROM pp, sv, k
              |  WHERE sv.rv = (pp.p * k.kk + 999) // 1000),
              |h AS (SELECT n_chars, count(*) AS c FROM d GROUP BY 1),
              |ch AS (SELECT n_chars,
              |    sum(c) OVER (ORDER BY n_chars) AS cum FROM h),
              |n AS (SELECT count(*) AS n FROM d),
              |ex AS (SELECT pp.p, min(ch.n_chars) AS exact_v
              |  FROM pp, ch, n
              |  WHERE ch.cum >= (pp.p * n.n + 999) // 1000 GROUP BY 1)
              |SELECT CAST(ex.p AS BIGINT) AS p_milli,
              |  CAST(exact_v AS BIGINT) AS exact_v,
              |  CAST(sketch_v AS BIGINT) AS sketch_v,
              |  CAST(abs(ch.cum * 1000 // n.n - ex.p) AS BIGINT)
              |    AS rank_err_milli
              |FROM ex JOIN sq ON ex.p = sq.p
              |  JOIN ch ON ch.n_chars = sq.sketch_v, n""".stripMargin)),

    QDef("q335_dbscan_clusters",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        val cap = NswIndex.effectiveBlockCap(s)
        DbscanOracle.sql = Some(dbscanOracleSql(cents, cap))
        // eps radius on the symmetrized kNN edges: recompute the
        // rounded cosine per edge (2·m·n edges, one kernel dot each)
        // and keep only neighbors inside eps — the density definition;
        // the kNN cap (m) bounds per-node work, eps bounds the RADIUS
        val vecs = emb.select(col("vec_id").as("id"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", norm(col("v")))
          .localCheckpoint()
        // artifact-addressed kNN graph (r12 verdict #1/#4): the most
        // expensive sf1 build in the tree becomes a one-time commit;
        // q359's serving twin (and any re-sweep over the same corpus)
        // reads the parquet artifact instead of rebuilding
        val edges = NswIndex.knnGraphArtifact(emb, "vec_id", "embedding",
            cents, probes = DbProbes, m = DbM,
            blockCap = cap, fpKey = s"$dir#embeddings#all")
          .join(vecs.select(col("id").as("src"), col("v").as("sv"),
            col("nrm").as("sn")), "src")
          .join(vecs.select(col("id").as("dst"), col("v").as("dv"),
            col("nrm").as("dn")), "dst")
          .filter(round(dot(col("sv"), col("dv")) /
            (col("sn") * col("dn")), 6) >= lit(EpsMilli / 1000.0))
          .select(col("src"), col("dst"))
          .localCheckpoint() // degrees + core filter + border attach
        dbscanLabel(emb, edges)
      },
      None,
      Some(() => DbscanOracle.sql)),

    // q335's DBSCAN in its STEADY-STATE serving shape (r12 verdict
    // #1/#4): the eps-neighborhood graph itself — kNN edges, cosine
    // re-checked, eps-filtered — is a write-once ARTIFACT. On a cold
    // root it derives once from the kNN-graph artifact q335 committed
    // earlier in the sweep (the 2·m·n dots, paid once); every later
    // sweep over the same corpus serves the parquet and spends its
    // whole budget on the core/border/noise labeling. Same rows as
    // q335 (Pipeline71Spec pins it); bench shows build vs serve side
    // by side. Falls back to the inline build with no root.
    QDef("q359_dbscan_served",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        val cap = NswIndex.effectiveBlockCap(s)
        DbscanServedOracle.sql = Some(dbscanOracleSql(cents, cap))
        val fpKey = s"$dir#embeddings#all"
        val ch = graft.ops.ArtifactStore.contentHash(
          cents.map(_.mkString(",")).mkString("|"))
        def epsEdges = {
          val vecs = emb.select(col("vec_id").as("id"),
              toDouble(col("embedding")).as("v"))
            .withColumn("nrm", norm(col("v")))
            .localCheckpoint()
          NswIndex.knnGraphArtifact(emb, "vec_id", "embedding",
              cents, probes = DbProbes, m = DbM,
              blockCap = cap, fpKey = fpKey)
            .join(vecs.select(col("id").as("src"), col("v").as("sv"),
              col("nrm").as("sn")), "src")
            .join(vecs.select(col("id").as("dst"), col("v").as("dv"),
              col("nrm").as("dn")), "dst")
            .filter(round(dot(col("sv"), col("dv")) /
              (col("sn") * col("dn")), 6) >= lit(EpsMilli / 1000.0))
            .select(col("src"), col("dst"))
        }
        // the artifact IS durable storage — only the no-root inline
        // shape needs the checkpoint (degrees + core + border attach
        // all re-read the eps graph)
        val edges = if (graft.ops.ArtifactStore.root(s).isEmpty)
          epsEdges.localCheckpoint()
          else graft.ops.ArtifactStore.buildOrServe(s, "dbscan_eps_edges",
            graft.ops.ArtifactStore.fingerprint(
              emb.select(col("vec_id"), col("embedding")), fpKey),
            s"k=${cents.length},ch=$ch,probes=$DbProbes,m=$DbM," +
              s"eps=$EpsMilli,cap=$cap", fpKey)(epsEdges)
        dbscanLabel(emb, edges)
      },
      None,
      Some(() => DbscanServedOracle.sql))
  )

  /** The DBSCAN labeling downstream of the eps-neighborhood graph —
    * shared verbatim by q335 (builds the graph) and q359 (serves it):
    * degree → core points, star-contraction components over the
    * core-core subgraph, border attach to the MIN adjacent core
    * cluster (deterministic), noise fill.
    */
  private def dbscanLabel(emb: org.apache.spark.sql.DataFrame,
                          edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val core = deg.filter(col("deg") >= MinPts)
      .select(col("src").as("vec_id")).localCheckpoint()
    val coreEdges = edges
      .join(core.withColumnRenamed("vec_id", "src"), "src")
      .join(core.withColumnRenamed("vec_id", "dst"), "dst")
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
    val comp = ConnectedComponents
      .runStarContraction(coreEdges, "src", "dst")
      .withColumnRenamed("node", "vec_id")
    val coreLabel = core.join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("cluster_id"))
      .localCheckpoint() // border attach reads it twice
    // border: non-core adjacent to a core — attach to the MIN
    // adjacent core cluster (deterministic)
    val border = edges
      .join(coreLabel.select(col("vec_id").as("dst"),
        col("cluster_id")), "dst")
      .join(core.withColumnRenamed("vec_id", "src"), Seq("src"),
        "left_anti")
      .groupBy(col("src").as("vec_id"))
      .agg(min("cluster_id").as("cluster_id"))
    val labeled = coreLabel.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
    emb.select(col("vec_id"))
      .join(labeled, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
  }

  /** DuckDB replay of q335 with literal centroids: the q257 salted
    * kNN-graph CTEs (multiprobe cells → salt cap → top-m symmetrized
    * edges), then degree → core, recursive-CTE components over the
    * core-core subgraph with min-id labels (the q79 pattern), border
    * attach, noise fill.
    */
  private def dbscanOracleSql(centroids: Array[Array[Double]],
                              cap: Int = NswIndex.DefaultBlockCap)
      : String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    // the house sequential-left-fold dot (bit-identical to the
    // DotProductDbl kernel's ascending accumulation)
    def dotSql(a: String, b: String) = VectorOracleSql.dot(a, b)
    def dotSelf(a: String) = dotSql(a, a)
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / " +
        s"(sqrt(${dotSelf("v")}) * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
    s"""WITH RECURSIVE e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |a AS (SELECT vec_id, list_reverse_sort($cells) AS cs FROM e),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, unnest(list_transform(list_slice(cs, 1, $DbProbes),
       |    x -> x.cell)) AS cell
       |  FROM a),
       |csz AS (SELECT cell, count(*) AS cn FROM cells GROUP BY cell),
       |sal AS MATERIALIZED (SELECT c.vec_id, c.cell,
       |    cast('0x' || substr(md5('nsw:' || CAST(c.vec_id AS VARCHAR)),
       |      1, 8) as bigint)
       |      % greatest(1, (cn + ${cap - 1}) // $cap) AS salt
       |  FROM cells c JOIN csz USING (cell)),
       |cand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst
       |  FROM sal x JOIN sal y
       |    ON x.cell = y.cell AND x.salt = y.salt
       |      AND x.vec_id <> y.vec_id),
       |sc AS MATERIALIZED (SELECT cand.src, cand.dst,
       |    round(${dotSql("sv.v", "dv.v")} /
       |      (sqrt(${dotSelf("sv.v")}) *
       |       sqrt(${dotSelf("dv.v")})), 6) AS sim
       |  FROM cand JOIN e sv ON sv.vec_id = cand.src
       |    JOIN e dv ON dv.vec_id = cand.dst),
       |tm AS (SELECT src, dst, sim FROM (
       |    SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst ASC) AS rn FROM sc) z
       |  WHERE rn <= $DbM),
       |edges AS MATERIALIZED (
       |  -- explicit DISTINCT over UNION ALL: under WITH RECURSIVE,
       |  -- DuckDB 1.0 does NOT dedup a plain UNION inside a named
       |  -- CTE (measured: 6000 rows where the same inline union
       |  -- yields 3722) — the one duckdbism this oracle must dodge
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst, sim FROM tm
       |    UNION ALL SELECT dst, src, sim FROM tm) z
       |  WHERE sim >= ${EpsMilli / 1000.0}),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |core AS MATERIALIZED (SELECT src AS vec_id FROM deg
       |  WHERE deg >= $MinPts),
       |ce AS (SELECT ed.src AS a, ed.dst AS b FROM edges ed
       |  JOIN core c1 ON c1.vec_id = ed.src
       |  JOIN core c2 ON c2.vec_id = ed.dst),
       |reach(a, b) AS (
       |  SELECT a, b FROM ce
       |  UNION
       |  SELECT r.a, ce.b FROM reach r JOIN ce ON r.b = ce.a),
       |cl AS (SELECT a AS vec_id, min(b) AS mn FROM reach GROUP BY a),
       |corelab AS MATERIALIZED (SELECT c.vec_id,
       |    least(c.vec_id, coalesce(cl.mn, c.vec_id)) AS cluster_id
       |  FROM core c LEFT JOIN cl USING (vec_id)),
       |bord AS (SELECT ed.src AS vec_id, min(k.cluster_id) AS cluster_id
       |  FROM edges ed JOIN corelab k ON k.vec_id = ed.dst
       |  WHERE ed.src NOT IN (SELECT vec_id FROM core)
       |  GROUP BY 1),
       |lab AS (SELECT vec_id, 'core' AS role, cluster_id FROM corelab
       |  UNION ALL
       |  SELECT vec_id, 'border', cluster_id FROM bord)
       |SELECT m.vec_id,
       |  coalesce(lab.role, 'noise') AS role,
       |  coalesce(lab.cluster_id, -1) AS cluster_id
       |FROM embeddings m LEFT JOIN lab USING (vec_id)""".stripMargin
  }
}
