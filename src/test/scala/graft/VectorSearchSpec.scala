package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

import scala.util.Random

/** Vector-search structure guarantees: tiling preserves the exact pair
  * set, k-means is deterministic, and IVF achieves full recall where it
  * is supposed to (clustered corpora at high thresholds).
  */
class VectorSearchSpec extends SparkSpec {

  test("sampleVectors is deterministic, bounded, and seed-sensitive") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count().toInt
    val a = VectorSearch.sampleVectors(emb, "vec_id", "embedding", 32, 42L)
    val b = VectorSearch.sampleVectors(emb, "vec_id", "embedding", 32, 42L)
    assert(a.length === 32)
    assert(a.map(_.toSeq) === b.map(_.toSeq), "same seed -> same sample")
    val c = VectorSearch.sampleVectors(emb, "vec_id", "embedding", 32, 43L)
    assert(a.map(_.toSeq) !== c.map(_.toSeq), "different seed -> different order")
    val all = VectorSearch.sampleVectors(emb, "vec_id", "embedding",
      n + 100, 42L)
    assert(all.length === n, "oversized n caps at the corpus")
  }
  import spark.implicits._

  private def randUnit(rnd: Random, d: Int): Array[Double] = {
    val v = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("tiled exact all-pairs == plain exact all-pairs") {
    val rnd = new Random(30)
    val vecs = (0 until 80).map(i => (i.toLong, randUnit(rnd, 16).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val plain = VectorSearch.nearDupExact(vecs, "vec_id", "embedding", 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tiled = VectorSearch.nearDupExactTiled(vecs, "vec_id", "embedding", 0.2,
        tiles = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain.nonEmpty)
    assert(tiled === plain)
  }

  test("kmeans centroids are deterministic for a fixed seed") {
    val rnd = new Random(31)
    val sample = Array.fill(200)(randUnit(rnd, 8))
    val a = VectorSearch.kmeansCentroids(sample, 4, 5, seed = 7)
    val b = VectorSearch.kmeansCentroids(sample.map(_.clone), 4, 5, seed = 7)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("IVF near-dup has full recall on clustered data at high threshold") {
    // 5 tight clusters: near-dup pairs (sim >= 0.9) live inside clusters,
    // where co-cell assignment is certain
    val rnd = new Random(32)
    val centers = Array.fill(5)(randUnit(rnd, 16))
    val vecs = (0 until 150).map { i =>
      val c = centers(i % 5)
      val noise = randUnit(rnd, 16).map(_ * 0.05)
      val v = c.zip(noise).map { case (a, b) => a + b }
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val exact = VectorSearch.nearDupExact(vecs, "vec_id", "embedding", 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val ivf = VectorSearch.nearDupIvf(vecs, "vec_id", "embedding", 0.9,
        k = 8, probes = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "clustered fixture must contain near-dups")
    assert(ivf === exact)
  }

  test("gated nearDupPairs: exact under the gate, cell-bounded reroute " +
    "above it matches exact on clustered data") {
    // same 5-tight-cluster geometry as the IVF recall test: above the
    // gate the reroute must find every within-cluster pair
    val rnd = new Random(34)
    val centers = Array.fill(5)(randUnit(rnd, 16))
    val vecs = (0 until 150).map { i =>
      val c = centers(i % 5)
      val noise = randUnit(rnd, 16).map(_ * 0.05)
      val v = c.zip(noise).map { case (a, b) => a + b }
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint()
    val exact = VectorSearch.nearDupExact(vecs, "vec_id", "embedding", 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // under the default gate (150 <= 10000): the exact tiled path
    val under = VectorSearch.nearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(under === exact)
    spark.conf.set(VectorSearch.GateConf, "10")
    try {
      // over the forced gate: reroutes to cell-bounded, same pair set
      val over = VectorSearch.nearDupPairs(vecs, "vec_id", "embedding", 0.9)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(over === exact, "cell-bounded reroute lost clustered recall")
      // the explicit escape hatch stays exact even over the gate, on
      // isotropic data where the cell path genuinely differs
      val rnd2 = new Random(35)
      val iso = (0 until 80).map(i => (i.toLong, randUnit(rnd2, 16).toSeq))
        .toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
      val isoExact = VectorSearch.nearDupExact(iso, "vec_id", "embedding", 0.2)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      val hatch = VectorSearch.nearDupPairs(iso, "vec_id", "embedding", 0.2,
          exact = true)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(isoExact.nonEmpty)
      assert(hatch === isoExact, "exact=true did not bypass the gate")
    } finally spark.conf.unset(VectorSearch.GateConf)
  }

  test("ivfAssign puts each vector in exactly `probes` cells") {
    val rnd = new Random(33)
    val vecs = (0 until 40).map(i => (i.toLong, randUnit(rnd, 8).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val sample = vecs.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val cents = VectorSearch.kmeansCentroids(sample, 4, 5, 1)
    val assign = VectorSearch.ivfAssign(vecs, "vec_id", "embedding", cents, 2)
    assert(assign.count() === 80L)
    assert(assign.groupBy("id").count().filter(col("count") =!= 2).count() === 0L)
  }

  test("topCells kernel == reversed-struct-sort HOF form, ties to the " +
    "higher cell (duplicate centroids force exact-equal sims)") {
    val rnd = new Random(36)
    val vecs = (0 until 60).map(i => (i.toLong, randUnit(rnd, 8).toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    // centroid 5 duplicates centroid 1 and 7 duplicates 3: every row
    // has at least two exact-equal sims, exercising the tie rule
    val base = Array.fill(6)(randUnit(rnd, 8))
    val cents = Array(base(0), base(1), base(2), base(3), base(4),
      base(1), base(5), base(3))
    for (probes <- Seq(1, 2, 3)) {
      val v = VectorSearch.toDouble(col("embedding"))
      val hof = vecs.select(col("vec_id"),
          slice(reverse(array_sort(array(cents.zipWithIndex.map {
            case (c, i) => struct(
              VectorSearch.cosine(v, typedLit(c.toSeq)).as("sim"),
              lit(i).as("cell"))
          }: _*))), 1, probes).getField("cell").as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val kern = vecs.select(col("vec_id"),
          VectorSearch.topCells(v, cents, probes).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(kern === hof, s"kernel != HOF at probes=$probes")
    }
    // the duplicate-centroid tie really resolves to the HIGHER index
    val top1 = vecs.select(VectorSearch.topCells(
        VectorSearch.toDouble(col("embedding")), cents, 8).as("cells"))
      .collect().map(_.getSeq[Int](0))
    top1.foreach { cells =>
      assert(cells.indexOf(5) < cells.indexOf(1),
        "duplicate centroid 5 must outrank its twin 1")
      assert(cells.indexOf(7) < cells.indexOf(3),
        "duplicate centroid 7 must outrank its twin 3")
    }
  }

  test("vecSub/vecAdd kernels == zip_with elementwise forms") {
    val rnd = new Random(37)
    val df = (0 until 50).map(i => (i.toLong,
        Seq.fill(16)(rnd.nextGaussian()), Seq.fill(16)(rnd.nextGaussian())))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorSearch.vecSub(col("a"), col("b")).as("s"),
        VectorSearch.vecAdd(col("a"), col("b")).as("p"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2)))
    val want = df.select(col("id"),
        zip_with(col("a"), col("b"), (x, y) => x - y).as("s"),
        zip_with(col("a"), col("b"), (x, y) => x + y).as("p"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2)))
    assert(got.toSeq == want.toSeq)
  }

  test("PQ encode matches a plain-Scala reimplementation; recon is exact " +
    "centroid concatenation") {
    val rnd = new Random(33)
    val dims = 16; val m = 4; val k = 8; val dsub = dims / m
    val data = (0 until 60).map(i => (i.toLong, randUnit(rnd, dims)))
    val vecs = data.map { case (i, v) => (i, v.toSeq) }
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val sample = VectorSearch.sampleVectors(vecs, "vec_id", "embedding", 40, 7L)
    val cb = VectorSearch.pqTrain(sample, m, k, iters = 5, seed = 7L)
    val v = VectorSearch.toDouble(col("embedding"))
    val codes = VectorSearch.pqEncode(v, cb)
    val out = vecs.select(col("vec_id") +:
        codes.zipWithIndex.map { case (c, i) => c.as(s"c$i") }: _*)
      .collect().map(r => r.getLong(0) ->
        (0 until m).map(i => r.getInt(i + 1))).toMap
    // the codegen'd kernel must produce the identical codes (it is
    // what query plans use; the expression form is this reference)
    val outKernel = vecs.select(col("vec_id"),
        VectorSearch.pqEncodeKernel(v, cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toIndexedSeq).toMap
    assert(out.keySet == outKernel.keySet)
    out.foreach { case (id, cs) => assert(outKernel(id) == cs, s"kernel vec $id") }
    // plain-Scala twin: same |c|^2 - 2<v,c> scoring, same tie-break.
    // The float32 round-trip (vector stored as array<float>) is applied
    // before scoring, as toDouble does.
    data.foreach { case (id, vec) =>
      val vf = vec.map(x => x.toFloat.toDouble)
      val expect = (0 until m).map { mi =>
        val sub = vf.slice(mi * dsub, (mi + 1) * dsub)
        cb(mi).zipWithIndex.map { case (c, ci) =>
          val dot = (0 until dsub).map(d => sub(d) * c(d)).reduce(_ + _)
          val cn2 = c.foldLeft(0.0)((s, x) => s + x * x)
          (cn2 + (-2.0 * dot), ci)
        }.min._2
      }
      assert(out(id) == expect, s"codes for vec $id")
    }
    // PQ reconstruction must beat coarse-only quantization: residual
    // codes add information, so mean cosine(v, recon) rises
    val coarse = VectorSearch.kmeansCentroids(sample, 4, iters = 5, seed = 9L)
    def cosD(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val meanPq = data.map { case (id, vec) =>
      val vf = vec.map(_.toFloat.toDouble).toSeq
      val r = out(id).zipWithIndex.flatMap { case (c, mi) => cb(mi)(c) }
      cosD(vf, r)
    }.sum / data.size
    val meanCoarse = data.map { case (_, vec) =>
      val vf = vec.map(_.toFloat.toDouble)
      val ci = coarse.indices.maxBy(i => (cosD(vf.toSeq, coarse(i).toSeq), i))
      cosD(vf.toSeq, coarse(ci).toSeq)
    }.sum / data.size
    assert(meanPq > meanCoarse,
      s"PQ recon ($meanPq) should beat coarse-only ($meanCoarse)")

    // all codes in range, recon returns the coded centroids verbatim
    assert(out.values.flatten.forall(c => c >= 0 && c < k))
    val recon = vecs.select(col("vec_id"),
        VectorSearch.pqRecon(codes, cb).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    data.foreach { case (id, _) =>
      val expect = out(id).zipWithIndex.flatMap { case (c, mi) => cb(mi)(c) }
      assert(recon(id) == expect)
    }
  }
}
