package graft

/** Recall contracts for the ANN family, measured against the exact
  * brute-force top-k (q28) on the sf0.001 fixture. These pin the
  * quality ladder — IVF exact-within-probed-cells at the top, then
  * full-scan PQ with exact re-rank, then IVF-PQ (probe coverage is the
  * inherent trade on near-uniform data) — so a parameter change that
  * silently degrades recall fails CI instead of shipping. Floors sit
  * one below the measured values to absorb benign re-trains.
  */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def ids(name: String): Set[Long] =
    SparkEntry.queries(name)(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("ANN recall ladder vs exact top-10 holds") {
    val exact = ids("q28_ann_bruteforce")
    assert(exact.size == 10)
    val ivf = (exact & ids("q30_ann_ivf")).size
    val lsh = (exact & ids("q31_ann_lsh")).size
    val sq8 = (exact & ids("q94_ann_sq8")).size
    val pq = (exact & ids("q85_ann_pq")).size
    val ivfpq = (exact & ids("q89_ann_ivfpq")).size
    val bin = (exact & ids("q223_ann_binary")).size
    assert(ivf >= 9, s"q30 IVF recall@10 degraded: $ivf")
    assert(lsh >= 4, s"q31 LSH top-5-in-exact-10 degraded: $lsh")
    assert(sq8 >= 9, s"q94 SQ8+re-rank recall@10 degraded: $sq8")
    assert(pq >= 7, s"q85 PQ+re-rank recall@10 degraded: $pq")
    assert(ivfpq >= 4, s"q89 IVF-PQ recall@10 degraded: $ivfpq")
    // binary sign quantization (1 bit/dim) is the coarsest rung; on
    // this near-uniform corpus its measured recall@10 is 3 (the same
    // no-free-structure property q188's RP audit reports at 0-2/10 —
    // top-10 cosine gaps sit far below the 1-bit distortion)
    assert(bin >= 2, s"q223 binary+re-rank recall@10 degraded: $bin")
    // the ladder itself: exact-search variants beat quantized ones,
    // finer quantization (SQ8, 1 B/dim) beats coarser (PQ, 1 B/subspace),
    // and every multi-bit rung beats the 1-bit signature
    assert(ivf >= pq && pq >= ivfpq && sq8 >= pq && sq8 >= bin)
  }

  test("layered HNSW descent holds the graph-ANN recall floor") {
    val exact = ids("q28_ann_bruteforce")
    val nsw = (exact & ids("q257_ann_nsw")).size
    val hnsw = (exact & ids("q362_ann_hnsw")).size
    info(s"measured recall@10: nsw=$nsw hnsw=$hnsw")
    // the top layer replaces q257's per-cell entry election with a
    // coarse-graph descent; on this corpus the seeded layer-0 beam
    // must stay within one hit of the flat NSW search
    assert(hnsw >= nsw - 1,
      s"q362 layered descent degraded vs flat NSW: $hnsw < $nsw - 1")
    assert(hnsw >= 4, s"q362 HNSW recall@10 floor broken: $hnsw")
  }

  test("entry-seeded served NSW (q392) re-measures the batch recall " +
    "floor: seeding round 0 with the entries' 1-hop neighborhoods " +
    "does not trail the bare-entry q358") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.ops.VectorSearch
    val emb = Tables.embeddings(spark, dir)
    val isQ = col("vec_id") % 100 === 0
    val e = emb.select(col("vec_id"),
      VectorSearch.toDouble(col("embedding")).as("v"))
    val qs = e.filter(isQ)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val exact = e.filter(!isQ).crossJoin(qs)
      .select(col("qid"), col("vec_id"),
        VectorSearch.cosine(col("v"), col("qv")).as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("rank") <= 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def hits(name: String): Int =
      SparkEntry.queries(name)(spark, dir)
        .select("qid", "vec_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .count { case (q, id) => exact.getOrElse(q, Set.empty)(id) }
    val base = hits("q358_ann_nsw_served")
    val seeded = hits("q392_ann_nsw_seeded")
    val nQ = exact.size
    info(s"batch recall@10 over $nQ queries: " +
      s"q358=$base q392=$seeded (of ${nQ * 10})")
    // seeding widens round 0 but the beam still truncates, so strict
    // monotonicity is not structural — one hit of slack absorbs an
    // eviction; the floor pins the absolute quality
    assert(seeded >= base - 1,
      s"entry seeding must not trail bare entries: $seeded vs $base")
    assert(seeded * 2 >= nQ * 10,
      s"absolute seeded recall floor (50%) broken: $seeded/${nQ * 10}")
  }
}
