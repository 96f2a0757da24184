package graft

import graft.ops.VectorSearch
import graft.streaming.StreamIvfRefresh
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.util.Random

/** The IVF maintenance loop: drifted arrivals trigger a retrain,
  * stable arrivals don't, the maintained sample is independent of
  * batch slicing (the q334 merge law), and occupancy addition is
  * replay-gated (the StreamMoments/StreamMerkle discipline).
  */
class StreamIvfRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val k = 4
  private val K = 64

  private def randUnit(rnd: Random, d: Int): Array[Double] = {
    val v = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def df(rows: Seq[(Long, Array[Double])]) =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

  /** Fresh store initialized from `corpus`. */
  private def initStore(corpus: Seq[(Long, Array[Double])]): String = {
    val store = Files.createTempDirectory("ivfr").toString + "/s.txt"
    val cents = VectorSearch.kmeansCentroids(corpus.map(_._2).toArray,
      k, iters = 4, seed = 42L)
    val occ = new Array[Long](k)
    val base = df(corpus)
    base.select(element_at(
        VectorSearch.topCells(VectorSearch.toDouble(col("embedding")),
          cents, 1), 1).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("c")).collect()
      .foreach(r => occ(r.getInt(0)) += r.getLong(1))
    StreamIvfRefresh.init(store, cents, occ)
    store
  }

  private def cluster(rnd: Random, center: Array[Double], n: Int,
                      from: Long): Seq[(Long, Array[Double])] =
    (0 until n).map { i =>
      val noise = randUnit(rnd, dims).map(_ * 0.1)
      val v = center.zip(noise).map { case (a, b) => a + b }
      val nn = math.sqrt(v.map(x => x * x).sum)
      (from + i, v.map(_ / nn))
    }

  test("stable arrivals never retrain; strongly drifted arrivals do, " +
    "and the retrained centroids serve the NEW region") {
    val rnd = new Random(50)
    val centers = Array.fill(3)(randUnit(rnd, dims))
    val corpus = centers.toSeq.zipWithIndex.flatMap { case (c, i) =>
      cluster(rnd, c, 40, 1000L * i)
    }
    // stable: more arrivals from the SAME clusters
    val stable = initStore(corpus)
    val more = centers.toSeq.zipWithIndex.flatMap { case (c, i) =>
      cluster(rnd, c, 30, 5000L + 1000L * i)
    }
    StreamIvfRefresh.applyBatch(df(more), 0L, "vec_id", "embedding",
      k, dims, K, psiThresholdMilli = 250L, stable)
    val st1 = StreamIvfRefresh.readStore(stable, k, dims, K)
    assert(st1.refreshes === 0L, "stable occupancy must not retrain")

    // drift: every arrival lands in a region the training never saw
    // (negated centers — cosine-opposite cells)
    val drifted = initStore(corpus)
    val away = centers.toSeq.zipWithIndex.flatMap { case (c, i) =>
      cluster(rnd, c.map(-_), 60, 9000L + 1000L * i)
    }
    StreamIvfRefresh.applyBatch(df(away), 0L, "vec_id", "embedding",
      k, dims, K, psiThresholdMilli = 250L, drifted)
    val st2 = StreamIvfRefresh.readStore(drifted, k, dims, K)
    assert(st2.refreshes === 1L, "drifted occupancy must retrain")
    // the retrained centroids live near the NEW region: every stored
    // sample vector (all drifted) has a cell at cosine > 0.5
    st2.sample.foreach { case (_, id, v) =>
      val best = st2.centroids.map { c =>
        val d = v.zip(c).map { case (a, b) => a * b }.sum
        d / (math.sqrt(v.map(x => x * x).sum) *
          math.sqrt(c.map(x => x * x).sum))
      }.max
      assert(best > 0.5, s"sample $id far from every refreshed centroid")
    }
    // PSI restarted: reference == current occupancy right after refresh
    assert(st2.refOcc.toSeq === st2.curOcc.toSeq)
  }

  test("batch slicing does not change the maintained sample or the " +
    "occupancy (the q334 merge law, applied)") {
    val rnd = new Random(51)
    val corpus = cluster(rnd, randUnit(rnd, dims), 40, 0L)
    val arrivals = cluster(rnd, randUnit(rnd, dims), 90, 100L)
    val a = initStore(corpus)
    val b = initStore(corpus)
    // one big batch vs three slices (ids arriving in different order)
    StreamIvfRefresh.applyBatch(df(arrivals), 0L, "vec_id", "embedding",
      k, dims, K, 100000L, a)
    val slices = arrivals.grouped(30).toSeq
    Seq(2, 0, 1).zipWithIndex.foreach { case (s, bi) =>
      StreamIvfRefresh.applyBatch(df(slices(s)), bi.toLong, "vec_id",
        "embedding", k, dims, K, 100000L, b)
    }
    val sa = StreamIvfRefresh.readStore(a, k, dims, K)
    val sb = StreamIvfRefresh.readStore(b, k, dims, K)
    assert(sa.sample.map(t => (t._1, t._2)) ===
      sb.sample.map(t => (t._1, t._2)), "sample must be slicing-proof")
    assert(sa.curOcc.toSeq === sb.curOcc.toSeq,
      "occupancy must be slicing-proof")
  }

  test("replayed batch ids are skipped (occupancy addition is not " +
    "idempotent); shape mismatch fails fast") {
    val rnd = new Random(52)
    val corpus = cluster(rnd, randUnit(rnd, dims), 40, 0L)
    val arrivals = df(cluster(rnd, randUnit(rnd, dims), 30, 100L))
      .localCheckpoint()
    val store = initStore(corpus)
    StreamIvfRefresh.applyBatch(arrivals, 0L, "vec_id", "embedding",
      k, dims, K, 100000L, store)
    val once = StreamIvfRefresh.readStore(store, k, dims, K)
    StreamIvfRefresh.applyBatch(arrivals, 0L, "vec_id", "embedding",
      k, dims, K, 100000L, store)
    val gated = StreamIvfRefresh.readStore(store, k, dims, K)
    assert(gated.curOcc.toSeq === once.curOcc.toSeq,
      "gated replay must be a no-op")
    StreamIvfRefresh.applyBatch(arrivals, 0L, "vec_id", "embedding",
      k, dims, K, 100000L, store, gate = false)
    val ungated = StreamIvfRefresh.readStore(store, k, dims, K)
    assert(ungated.curOcc.sum === 2 * once.curOcc.sum,
      "ungated replay double-counts")
    val ex = intercept[IllegalArgumentException] {
      StreamIvfRefresh.readStore(store, k + 1, dims, K)
    }
    assert(ex.getMessage.contains("refusing to mis-index"))
  }

  test("poison rows are dropped, not batch-killers: null and " +
    "wrong-dims vectors are filtered, and a re-sent id holds ONE " +
    "sample slot (r12 advice)") {
    val rnd = new Random(53)
    val corpus = (0 until 40).map(i => (i.toLong, randUnit(rnd, dims)))
    val store = initStore(corpus)
    val good = (100 until 110).map(i => (i.toLong, randUnit(rnd, dims)))
    // batch 0: good rows + a null vector + a wrong-dims vector
    val poisoned = df(good)
      .unionByName(Seq((900L, None: Option[Seq[Double]]))
        .toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
      .unionByName(df(Seq((901L, randUnit(rnd, dims + 3)))))
    StreamIvfRefresh.applyBatch(poisoned, 0L, "vec_id", "embedding",
      k, dims, K, 100000L, store) // must not throw
    val st = StreamIvfRefresh.readStore(store, k, dims, K)
    assert(st.curOcc.sum === good.size,
      "only the well-formed rows may enter the occupancy")
    assert(!st.sample.exists(s => s._2 == 900L || s._2 == 901L),
      "poison rows must not enter the sample")
    // batch 1 re-sends the SAME good ids: sample slots must not double
    StreamIvfRefresh.applyBatch(df(good), 1L, "vec_id", "embedding",
      k, dims, K, 100000L, store)
    val st2 = StreamIvfRefresh.readStore(store, k, dims, K)
    val keys = st2.sample.map(s => (s._1, s._2))
    assert(keys.distinct.size === keys.size,
      "a re-sent (hash, id) must occupy one sample slot")
  }
}
