package graft

import graft.ops.{NswIndex, VectorSearch}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Structure + recall guarantees for the bounded-round graph ANN: the
  * edge table is symmetric with bounded out-degree, and on clustered
  * data (where graph navigation is supposed to shine) the beam search
  * recovers the exact top-10 — at least matching IVF probing the same
  * cells, while the NSW candidate ceiling (entries + rounds · beam ·
  * (m+1) scored rows) is corpus-size-INDEPENDENT where IVF's probed
  * cells are a fixed fraction of the corpus.
  */
class NswIndexSpec extends SparkSpec {
  import spark.implicits._

  private def randUnit(rnd: Random, d: Int): Array[Double] = {
    val v = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def noisy(rnd: Random, c: Array[Double]): Array[Double] = {
    val noise = randUnit(rnd, c.length).map(_ * 0.05)
    val v = c.zip(noise).map { case (a, b) => a + b }
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("knn graph is symmetric with out-degree <= m") {
    val rnd = new Random(35)
    val vecs = (0 until 60).map(i => (i.toLong, randUnit(rnd, 8).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val sample = VectorSearch.sampleVectors(vecs, "vec_id", "embedding",
      64, 5L)
    val cents = VectorSearch.kmeansCentroids(sample, 4, 5, 5L)
    val edges = NswIndex.knnGraph(vecs, "vec_id", "embedding", cents,
      probes = 2, m = 3)
    val es = edges.as[(Long, Long)].collect().toSet
    assert(es.nonEmpty)
    assert(es.forall { case (a, b) => es.contains((b, a)) },
      "symmetrized graph must contain both directions")
    // The DIRECTED top-m bound (≤ m picks per src) is what the op
    // promises; after symmetrization a node's degree is its picks plus
    // incoming reverses. A hub can attract many reverses in general,
    // but on this near-uniform 60-node fixture the reverse count stays
    // ≤ m per node, so total degree ≤ 2m is a real regression trap for
    // a top-m prune that ignores m (the old `<= node count` assertion
    // could never fail on a self-loop-free graph).
    val deg = es.groupBy(_._1).map(_._2.size)
    assert(deg.max <= 2 * 3,
      s"total degree ${deg.max} exceeds 2m=6 — top-m prune ignored m?")
    assert(es.forall { case (a, b) => a != b }, "no self loops")
  }

  test("clustered fixture: beam search recovers the exact top-10 and " +
    "matches-or-beats IVF probing the same cells") {
    val rnd = new Random(36)
    val centers = Array.fill(5)(randUnit(rnd, 16))
    val corpus = (0 until 150).map { i =>
      (i.toLong, noisy(rnd, centers(i % 5)).toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint()
    val qArr = noisy(rnd, centers(0))
    val qLit = typedLit(qArr.toSeq)
    val exact = VectorSearch.bruteForceTopK(corpus, "vec_id", "embedding",
        qLit, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(exact.size === 10)

    val sample = VectorSearch.sampleVectors(corpus, "vec_id", "embedding",
      128, 5L)
    val cents = VectorSearch.kmeansCentroids(sample, 8, 10, 5L)
    val edges = NswIndex.knnGraph(corpus, "vec_id", "embedding", cents,
      probes = 2, m = 6).localCheckpoint()
    val vecs = corpus.select(col("vec_id").cast("long").as("id"),
        VectorSearch.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorSearch.norm(col("v")))
      .localCheckpoint()
    val query = Seq(1).toDF("one")
      .select(qLit.as("qv"))
      .withColumn("qn", VectorSearch.norm(col("qv")))
    val assign = VectorSearch.ivfAssign(corpus, "vec_id", "embedding",
      cents, probes = 2).localCheckpoint()
    val qCells = VectorSearch.ivfAssign(
        Seq((9999L, qArr.toSeq)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, probes = 2)
      .select(col("cell"))
    val entries = assign.join(broadcast(qCells), "cell")
      .groupBy("cell").agg(min("id").as("id")).select(col("id"))
      .unionByName(assign.agg(min("id").as("id")))
      .distinct()
    val nsw = NswIndex.beamSearch(vecs, edges, query, entries,
        beamWidth = 12, rounds = 3)
      .orderBy(col("sim").desc, col("id").asc).limit(10)
      .select("id").as[Long].collect().toSet
    // IVF at the SAME index budget: exact-score every vector in the
    // query's probed cells, top-10
    val ivf = assign.join(broadcast(qCells), "cell")
      .select(col("id")).distinct()
      .join(vecs, "id")
      .crossJoin(broadcast(query))
      .select(col("id"),
        round(VectorSearch.dot(col("v"), col("qv")) /
          (col("nrm") * col("qn")), 6).as("sim"))
      .orderBy(col("sim").desc, col("id").asc).limit(10)
      .select("id").as[Long].collect().toSet
    val nswRecall = (nsw & exact).size
    val ivfRecall = (ivf & exact).size
    assert(nswRecall === 10,
      s"NSW must recover the exact top-10 on clustered data: $nswRecall")
    assert(nswRecall >= ivfRecall,
      s"NSW ($nswRecall) must match-or-beat IVF ($ivfRecall)")
  }

  test("blockCap salting bounds candidate blocks without breaking " +
    "graph structure; a non-binding cap is a no-op") {
    val rnd = new Random(38)
    val vecs = (0 until 80).map(i => (i.toLong, randUnit(rnd, 8).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint()
    val sample = VectorSearch.sampleVectors(vecs, "vec_id", "embedding",
      96, 5L)
    val cents = VectorSearch.kmeansCentroids(sample, 4, 5, 5L)
    // cap far above any cell population (160 assignments / 4 cells)
    val loose = NswIndex.knnGraph(vecs, "vec_id", "embedding", cents,
      probes = 2, m = 3, blockCap = 10000).as[(Long, Long)].collect().toSet
    val default = NswIndex.knnGraph(vecs, "vec_id", "embedding", cents,
      probes = 2, m = 3).as[(Long, Long)].collect().toSet
    // a binding cap: cells of ~40-80 assignments split into blocks ≤ 8
    val capped = NswIndex.knnGraph(vecs, "vec_id", "embedding", cents,
      probes = 2, m = 3, blockCap = 8).as[(Long, Long)].collect().toSet
    assert(loose === default,
      "a cap above every cell population must not change the graph")
    assert(capped.nonEmpty)
    assert(capped.forall { case (a, b) => capped.contains((b, a)) },
      "salted graph must stay symmetric")
    assert(capped.forall { case (a, b) => a != b }, "no self loops")
    assert(capped !== default,
      "a binding cap must actually restrict the candidate pools " +
        "(top-m picked from ≤cap-sized blocks, not whole cells)")
  }

  test("knn-graph candidate join is an equi join on (cell, salt) — " +
    "never a cartesian or nested-loop pairing") {
    val rnd = new Random(39)
    val vecs = (0 until 50).map(i => (i.toLong, randUnit(rnd, 8).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val sample = VectorSearch.sampleVectors(vecs, "vec_id", "embedding",
      64, 5L)
    val cents = VectorSearch.kmeansCentroids(sample, 4, 5, 5L)
    val edges = NswIndex.knnGraph(vecs, "vec_id", "embedding", cents,
      probes = 2, m = 3)
    val p = edges.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"),
      s"candidate generation degraded to a cartesian:\n$p")
    assert(p.contains("salt"),
      s"candidate join lost the blockCap salt key:\n$p")
  }

  test("q257/q259 are partition-invariant: identical output under a " +
    "different shuffle-partition count") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      val a257 = rows("q257_ann_nsw")
      val a259 = rows("q259_ann_nsw_batch")
      conf.set("spark.sql.shuffle.partitions", "7")
      assert(rows("q257_ann_nsw") === a257,
        "q257 output depends on the shuffle partitioning")
      assert(rows("q259_ann_nsw_batch") === a259,
        "q259 output depends on the shuffle partitioning")
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("batch beam search == per-query beam search on the same graph") {
    val rnd = new Random(37)
    val centers = Array.fill(4)(randUnit(rnd, 12))
    val corpus = (0 until 120).map { i =>
      (i.toLong, noisy(rnd, centers(i % 4)).toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint()
    val qArrs = (0 until 3).map(i => (900L + i, noisy(rnd, centers(i))))
    val sample = VectorSearch.sampleVectors(corpus, "vec_id", "embedding",
      128, 7L)
    val cents = VectorSearch.kmeansCentroids(sample, 6, 8, 7L)
    val edges = NswIndex.knnGraph(corpus, "vec_id", "embedding", cents,
      probes = 2, m = 5).localCheckpoint()
    val vecs = corpus.select(col("vec_id").cast("long").as("id"),
        VectorSearch.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorSearch.norm(col("v")))
      .localCheckpoint()
    val assign = VectorSearch.ivfAssign(corpus, "vec_id", "embedding",
      cents, probes = 2).localCheckpoint()
    val globalMin = assign.agg(min("id").as("id"))

    // batch run over all three queries at once
    val queries = qArrs.toDF("qid", "qv")
      .withColumn("qn", VectorSearch.norm(col("qv")))
      .localCheckpoint()
    val qAssign = VectorSearch.ivfAssign(
        qArrs.map { case (q, v) => (q, v.toSeq) }.toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents, probes = 2)
    val entries = qAssign.select(col("id").as("qid"), col("cell"))
      .join(broadcast(assign.groupBy("cell").agg(min("id").as("id"))),
        "cell")
      .select(col("qid"), col("id"))
      .unionByName(queries.select(col("qid")).crossJoin(
        broadcast(globalMin)))
      .distinct()
      .localCheckpoint()
    val batch = NswIndex.beamSearchBatch(vecs, edges, queries, entries,
        beamWidth = 8, rounds = 2)
      .select("qid", "id", "sim").as[(Long, Long, Double)]
      .collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(r => (r._2, r._3)).toSet }

    // per-query singles over the identical graph/entries
    qArrs.foreach { case (qid, arr) =>
      val query = Seq(1).toDF("one")
        .select(typedLit(arr.toSeq).as("qv"))
        .withColumn("qn", VectorSearch.norm(col("qv")))
      val single = NswIndex.beamSearch(vecs, edges, query,
          entries.filter(col("qid") === qid).select(col("id")),
          beamWidth = 8, rounds = 2)
        .as[(Long, Double)].collect().toSet
      assert(batch(qid) === single,
        s"batch beam for $qid must equal the single-query beam")
    }
  }
}
