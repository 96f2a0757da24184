package graft

import graft.ops.Coreset
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Tenth query group: the branches the synthetic corpus can't reach
  * (sf0.01 plants no duplicates) plus a brute-force twin for the
  * greedy k-center traversal.
  */
class PipelineQueries10Spec extends SparkSpec {
  import spark.implicits._

  test("normalized dedup clusters case/punctuation variants that raw " +
    "md5 dedup misses") {
    val dir = Files.createTempDirectory("q153").toString
    Seq(
      (1L, "Hello, World!", "en", "s0", 13L),
      (2L, "hello   world", "en", "s0", 13L),
      (3L, "HELLO WORLD.", "en", "s1", 12L),
      (4L, "goodbye world", "en", "s1", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q153_normalized_dedup")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map { case (_, canon, n, raw) => (canon, n, raw) }.toSet
    // 1/2/3 normalize to "hello world" (three DISTINCT raw texts —
    // exactly the clusters only normalization finds); 4 is a singleton
    assert(got === Set((1L, 3L, 3L), (4L, 1L, 1L)))
  }

  test("greedy k-center == brute-force farthest-point traversal") {
    val dir = Files.createTempDirectory("q151").toString
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextDouble().toFloat), (i % 3).toInt))
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    def d2micro(a: Array[Float], b: Array[Float]): Long = {
      // same expression tree as the operator: ((nsq_a + nsq_b) - 2ab)
      // with left-fold double sums, floored to micros per center
      def dot(x: Array[Float], y: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
        s
      }
      math.floor(1e6 * ((dot(a, a) + dot(b, b)) - (2.0 * dot(a, b)))).toLong
    }
    val k = 5
    var chosen = List(0L)
    var expect = List((1L, 0L, -1L))
    (2 to k).foreach { r =>
      val cand = vecs.filter(v => !chosen.contains(v._1)).map { case (id, v, _) =>
        (id, chosen.map(c => d2micro(v, vecs(c.toInt)._2)).min)
      }
      val (id, m) = cand.maxBy { case (id, m) => (m, -id) }
      chosen :+= id
      expect :+= ((r.toLong, id, m))
    }
    val got = Coreset.kCenter(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", k)
    assert(got === expect)
  }
}
