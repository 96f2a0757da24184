package graft

import org.apache.spark.sql.functions._

/** Pins q220's Gram identity: the pair-free ‖Σq‖² − Σ‖qᵢ‖²
  * construction must equal brute-force pairwise dot enumeration on
  * the same quantized vectors — the identity is the whole reason the
  * operator scales, so it gets an independent check.
  */
class Pipeline25Spec extends SparkSpec {
  import spark.implicits._

  test("q220: Gram-identity pair sum == brute-force pairwise dots") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, -1.5f), 7),
      (1L, Array(-2.0f, 0.5f, 3.0f), 7),
      (2L, Array(0.25f, -4.0f, 1.0f), 7),
      (3L, Array(5.0f, 5.0f, 5.0f), 7),
      (4L, Array(1.0f, 0.0f, 0.0f), 9),
      (5L, Array(0.0f, 1.0f, 0.0f), 9))
    val dir = java.nio.file.Files.createTempDirectory("p25").toString
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val got = queries.PipelineQueries25.defs
      .find(_.name == "q220_embed_diversity").get.fn(spark, dir)
      .select("label", "n_vecs", "pair_dot_sum")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    def quant(v: Array[Float]): Array[Long] = {
      val d = v.map(_.toDouble)
      val nrm = math.sqrt(d.map(x => x * x).sum)
      d.map(x => math.floor(1000000.0 * (x / nrm)).toLong)
    }
    def bruteBoth(label: Int): (Long, Long) = {
      val qs = vecs.filter(_._3 == label).map(v => quant(v._2))
      val pairSum = (for {
        i <- qs.indices; j <- qs.indices if i != j
      } yield qs(i).zip(qs(j)).map { case (a, b) => a * b }.sum).sum
      (qs.size.toLong, pairSum)
    }
    Seq(7, 9).foreach { l =>
      assert(got(l.toLong) == bruteBoth(l),
        s"label $l: got ${got(l.toLong)}, want ${bruteBoth(l)}")
    }
    // orthogonal unit pair: pair dot sum exactly 0 up to quantization
    assert(math.abs(got(9L)._2) < 10L)
  }
}
