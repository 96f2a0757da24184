package graft

import graft.ops.VectorSearch
import graft.streaming.StreamAnnIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files
import scala.util.Random

/** Streaming ANN ingest (continuous IVF probe): draining the corpus
  * as a multi-batch stream and re-ranking the admission log must
  * reproduce EXACTLY the batch IVF probe over the same centroids and
  * the same micro-quantized scores; a replayed batch admits nothing
  * new (Append-mode idempotence under source replay).
  */
class StreamAnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def randUnit(rnd: Random, d: Int): Array[Double] = {
    val v = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  test("drained admission log re-ranks to the batch IVF probe top-k; " +
    "a replayed batch admits nothing") {
    val rnd = new Random(40)
    val dims = 12
    val all = (0 until 90).map(i => (i.toLong, randUnit(rnd, dims).toSeq))
    val query = randUnit(rnd, dims)
    val corpus = all.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint()
    val sample = VectorSearch.sampleVectors(corpus, "vec_id", "embedding",
      96, 5L)
    val cents = VectorSearch.kmeansCentroids(sample, 4, 5, 5L)
    val k = 5

    // batch truth: the SAME assignment + nscore expressions, probed
    // cells only, global top-k ascending (nscore, id)
    val qCells = StreamAnnIngest.queryCells(cents, query, probes = 2)
    val v = VectorSearch.toDouble(col("embedding"))
    val cellStructs = cents.zipWithIndex.map { case (c, i) =>
      struct(VectorSearch.cosine(v, typedLit(c.toSeq)).as("sim"),
        lit(i).as("cell"))
    }
    val batchTop = corpus
      .select(col("vec_id").cast("long").as("id"), v.as("v"),
        explode(slice(reverse(array_sort(array(cellStructs: _*))), 1, 2))
          .as("e"))
      .filter(col("e.cell").isin(qCells: _*))
      .select(col("id"),
        StreamAnnIngest.nscore(col("v"), query.toSeq).as("nscore"))
      .distinct() // a vector probed in 2 query cells counts once
      .orderBy(col("nscore").asc, col("id").asc).limit(k)
      .as[(Long, Long)].collect().toSeq

    // stream: same rows in a shuffled arrival order across 3 batches,
    // then batch 1 REPLAYED as a 4th file
    val src = Files.createTempDirectory("sann").toString
    val shuffled = new Random(41).shuffle(all)
    val slices = shuffled.grouped(30).toSeq
    slices.zipWithIndex.foreach { case (s, i) =>
      s.toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .write.parquet(s"$src/b$i.parquet")
    }
    slices.head.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.parquet(s"$src/b9replay.parquet")
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamAnnIngest.probeAdmissions(stream, "vec_id", "embedding",
        cents, probes = 2, query = query, k = k)
      .toDF("cell", "nscore", "id")
      .writeStream.format("memory").queryName("sann")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val admitted = spark.table("sann")
      .as[(Long, Long, Long)].collect().toSeq

    // replay silence: every admission is unique (the replayed batch's
    // rows were all either still-in-top-k re-arrivals or dominated)
    assert(admitted.distinct.size === admitted.size,
      "replayed rows must not duplicate admissions")
    // the admission log is small: per cell at most the running-top-k
    // improvement count, never the probed population
    assert(admitted.size < 90, s"admission log too large: ${admitted.size}")
    // re-rank: global top-k of the admission log == batch IVF top-k
    val reRanked = admitted.map(a => (a._3, a._2)).distinct
      .sortBy(a => (a._2, a._1)).take(k).map(a => (a._1, a._2))
      .sortBy(a => (a._2, a._1))
    assert(reRanked === batchTop,
      s"stream re-rank $reRanked != batch probe $batchTop")
  }
}
