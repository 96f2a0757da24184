package graft

import graft.ops.{NswIndex, TopK, VectorSearch}
import org.apache.spark.sql.functions._

/** Invariants of the sixty-first group (oracle parity checks values):
  *  - q334: the MERGE LAW — the union of per-source bottom-K sketches
  *    re-truncated to K equals the corpus-direct bottom-K exactly
  *    (the property that makes the sketch a 100 TB shard-merge path),
  *    and the audited rank error is within the uniform-sample bound.
  *  - q335: DBSCAN role semantics on the kNN graph — cores have
  *    degree ≥ MinPts, edge-adjacent cores share a cluster, border
  *    points attach to an adjacent core's cluster, noise has no core
  *    neighbor.
  */
class Pipeline61Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("q334 merge law: union of per-source bottom-K, re-truncated, " +
    "== corpus-direct bottom-K exactly") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), col("source"),
        graft.ops.Sketches.hash60(concat(lit("rs:"),
          col("doc_id").cast("string"))).as("h"))
      .localCheckpoint()
    val k = 64
    val direct = TopK.perGroup(docs.withColumn("g", lit(1L)), "g",
        struct(col("h"), col("doc_id")), k)
      .select(col("key.doc_id")).as[Long].collect().toSet
    val perSrc = TopK.perGroup(docs, "source",
      struct(col("h"), col("doc_id")), k)
    val merged = TopK.perGroup(perSrc.withColumn("g", lit(1L)), "g",
        struct(col("key.h").as("h"), col("key.doc_id").as("doc_id")), k)
      .select(col("key.doc_id")).as[Long].collect().toSet
    assert(direct.size === k)
    assert(merged === direct, "sketch merge must be lossless")
  }

  test("q334 audit: sketch quantiles carry a bounded rank error and " +
    "exact quantiles have zero by construction") {
    val rows = SparkEntry.queries("q334_rank_sketch_merge")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).sorted.toSeq === Seq(250L, 500L, 750L, 900L))
    rows.foreach { case (p, _, _, err) =>
      // K=256 uniform sample: rank se ≈ √(p(1-p)/K) ≤ ~31 milli; 100
      // milli (~3 se) is the generous deterministic-fixture bound
      assert(err <= 100L, s"p=$p rank error $err milli out of bound")
    }
  }

  test("q335 role semantics: core degrees, connected-core cluster " +
    "agreement, border attachment, noise isolation") {
    val out = SparkEntry.queries("q335_dbscan_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val emb = Tables.embeddings(spark, dir)
    val cents = VectorSearch.kmeansCentroids(
      VectorSearch.sampleVectors(emb, "vec_id", "embedding", 512, 42),
      k = 16, iters = 10, seed = 42)
    val vecs = emb.select(col("vec_id"),
        VectorSearch.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    def cos6(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      val dot = x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      val nx = math.sqrt(x.foldLeft(0.0)((s, t) => s + t * t))
      val ny = math.sqrt(y.foldLeft(0.0)((s, t) => s + t * t))
      BigDecimal(dot / (nx * ny))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // the query's eps radius (rounded cosine >= 0.3) applied to the
    // same symmetrized kNN edges
    val edges = NswIndex.knnGraph(emb, "vec_id", "embedding", cents,
        probes = 2, m = 6, blockCap = NswIndex.DefaultBlockCap)
      .select(col("src"), col("dst")).as[(Long, Long)].collect()
      .filter { case (a, b) => cos6(a, b) >= 0.3 }
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val roles = Seq("core", "border", "noise")
    assert(out.values.map(_._1).toSet.subsetOf(roles.toSet))
    assert(roles.forall(r => out.values.exists(_._1 == r)),
      "fixture must exercise all three roles")
    out.foreach { case (id, (role, cl)) =>
      val d = deg.getOrElse(id, 0)
      if (role == "core") assert(d >= 4, s"core $id degree $d")
      else assert(d < 4, s"$role $id degree $d should be < MinPts")
      if (role == "noise") assert(cl === -1L)
      else assert(cl >= 0L)
    }
    // edge-adjacent cores agree on the cluster
    edges.foreach { case (a, b) =>
      if (out(a)._1 == "core" && out(b)._1 == "core")
        assert(out(a)._2 === out(b)._2, s"cores $a-$b disagree")
    }
    // border points attach to a cluster of SOME adjacent core; noise
    // has no core neighbor at all
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    out.foreach { case (id, (role, cl)) =>
      val coreNbrs = adj.getOrElse(id, Array.empty[Long])
        .filter(n => out(n)._1 == "core")
      role match {
        case "border" =>
          assert(coreNbrs.nonEmpty, s"border $id has no core neighbor")
          assert(coreNbrs.map(out(_)._2).min === cl,
            s"border $id not attached to min adjacent cluster")
        case "noise" =>
          assert(coreNbrs.isEmpty, s"noise $id touches a core")
        case _ => ()
      }
    }
  }
}
