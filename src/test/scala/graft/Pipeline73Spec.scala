package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** q375/q376 contracts beyond the oracle gate: the multi-probe query
  * fans out without touching the corpus index, its candidate set
  * contains the single-probe one by construction, and the flip choice
  * really picks the lowest-|margin| bits.
  */
class Pipeline73Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("multiProbeKeys: per band, base key first, then single-bit " +
    "flips of the lowest-|margin| bits — distinct keys, base included") {
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))
      .filter(col("vec_id") === 0)
    val keys = e.select(explode(VectorSearch.multiProbeKeys(col("v"),
        bands = 4, bitsPerBand = 4, dims = 64, extraProbes = 2)).as("pk"))
      .select(col("pk.band"), col("pk.key"))
      .as[(Int, Int)].collect()
    assert(keys.length === 12, "4 bands x (1 base + 2 probes)")
    val base = e.select(
      (0 until 4).map { b =>
        (0 until 4).map(i =>
          VectorSearch.signBit(col("v"), b * 4 + i, 64) * (1 << i))
          .reduce(_ + _).as(s"k$b")
      }: _*).as[(Int, Int, Int, Int)].head()
    val baseKeys = Seq(base._1, base._2, base._3, base._4)
    keys.groupBy(_._1).foreach { case (band, ks) =>
      assert(ks.length === 3)
      val bk = baseKeys(band)
      assert(ks.map(_._2).contains(bk), s"band $band must probe its base")
      // each probe differs from base in exactly one bit
      ks.map(_._2).filter(_ != bk).foreach { k =>
        assert(Integer.bitCount(k ^ bk) === 1,
          s"band $band probe $k must be a single-bit flip of $bk")
      }
      assert(ks.map(_._2).distinct.length === 3, "probes must be distinct")
    }
  }

  test("multiProbeKeys == a plain-Scala reimplementation on real " +
    "corpus vectors (margins, sort, flips — the whole arithmetic)") {
    val rows = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorSearch.toDouble(col("embedding")).as("v"))
      .orderBy(col("vec_id")).limit(5)
      .as[(Long, Seq[Double])].collect()
    val planes = (0 until 16).map(p =>
      VectorSearch.planeVector(p, 64).toArray)
    def scalaKeys(v: Seq[Double]): Seq[(Int, Int)] =
      (0 until 4).flatMap { b =>
        // same left-fold as the Column aggregate (seed 0.0, in order)
        val projs = (0 until 4).map { i =>
          v.zip(planes(b * 4 + i)).foldLeft(0.0) {
            case (acc, (x, w)) => acc + x * w }
        }
        val base = projs.zipWithIndex
          .map { case (p, i) => if (p > 0) 1 << i else 0 }.sum
        val order = projs.zipWithIndex
          .map { case (p, i) => (math.abs(p), i) }.sorted
        Seq((b, base),
          (b, base ^ (1 << order(0)._2)),
          (b, base ^ (1 << order(1)._2)))
      }
    rows.foreach { case (id, v) =>
      val got = graft.Tables.embeddings(spark, dir)
        .where(col("vec_id") === id)
        .select(explode(VectorSearch.multiProbeKeys(
          VectorSearch.toDouble(col("embedding")), 4, 4, 64, 2)).as("pk"))
        .select(col("pk.band"), col("pk.key"))
        .as[(Int, Int)].collect().toSeq
      assert(got === scalaKeys(v), s"vector $id probe keys diverge")
    }
  }

  test("multi-probe candidates are a SUPERSET of the single-probe " +
    "(q31) candidates, and q376's top-5 re-rank is exact over them") {
    val emb = graft.Tables.embeddings(spark, dir)
    val buckets = VectorSearch.lshCandidates(emb, "vec_id", "embedding",
      bands = 4, bitsPerBand = 4, dims = 64).localCheckpoint()
    val e = emb.select(col("vec_id"),
      VectorSearch.toDouble(col("embedding")).as("v"))
    def cands(qKeys: org.apache.spark.sql.DataFrame): Set[Long] =
      buckets.filter(col("id") =!= 0)
        .join(broadcast(qKeys), Seq("band", "key"))
        .select(col("id")).as[Long].collect().toSet
    val single = cands(buckets.filter(col("id") === 0)
      .select(col("band"), col("key")))
    val multi = cands(e.filter(col("vec_id") === 0)
      .select(explode(VectorSearch.multiProbeKeys(col("v"), 4, 4, 64, 2))
        .as("pk"))
      .select(col("pk.band").as("band"), col("pk.key").as("key")))
    assert(single.subsetOf(multi),
      s"multi-probe must contain the base candidates: " +
        s"${(single -- multi).take(5)} missing")
    // q376's answer == brute-force cosine top-5 restricted to the
    // multi-probe candidate set (re-rank adds no approximation)
    val got = SparkEntry.queries("q376_ann_lsh_multiprobe")(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSet
    val want = e.filter(col("vec_id") =!= 0)
      .filter(col("vec_id").isin(multi.toSeq: _*))
      .crossJoin(broadcast(e.filter(col("vec_id") === 0)
        .select(col("v").as("qv"))))
      .select(col("vec_id"),
        round(VectorSearch.cosine(col("v"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(got === want)
  }

  test("q375's delta-served union equals a plain inline recomputation " +
    "of the post-append corpus (the store adds no approximation)") {
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q375_delta_token_counts")(spark, dir)
      .collect().map(_.toString).toSet
    val docs = graft.Tables.documents(spark, dir)
      .select(col("text"), col("source"))
    val minSrc = docs.agg(min("source")).head().getString(0)
    val want = docs.unionByName(docs.where(col("source") === minSrc))
      .select(col("source"),
        explode(graft.functions.TextAnalysis.tokens(col("text")))
          .as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n").desc, col("token"))).cast("long"))
      .where(col("rk") <= 5)
      .select(col("source"), col("token"), col("n"), col("rk"))
      .collect().map(_.toString).toSet
    assert(got === want)
  }
}
