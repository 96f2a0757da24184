package graft

import graft.streaming.StreamTopK
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Streaming top-k admission log: a later arrival worse than the
  * settled top-k is never emitted; the batch top-k OF the admission
  * log equals the full batch top-k (the prefix-dominance guarantee
  * the operator's Scaladoc states).
  */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch admissions: dominated late arrivals stay silent; " +
    "top-k of the admission log == batch top-k") {
    val src = Files.createTempDirectory("stopk").toString
    // group 1: batch-1 scores {5, 3, 9}; group 2: {7}
    Seq((1L, 5L, 10L), (1L, 3L, 11L), (1L, 9L, 12L), (2L, 7L, 20L))
      .toDF("g", "score", "id").write.parquet(s"$src/b1.parquet")
    // batch 2: 100 is worse than group 1's settled top-2 {3, 5} and
    // must NOT be admitted; 1 beats it and must be; (2, 7, 20) is a
    // RE-ARRIVAL of a pair already in group 2's top-k and must stay
    // silent (a replayed source would otherwise duplicate admissions)
    Seq((1L, 100L, 13L), (1L, 1L, 14L), (2L, 2L, 21L), (2L, 7L, 20L))
      .toDF("g", "score", "id").write.parquet(s"$src/b2.parquet")
    val stream = spark.readStream
      .schema("g LONG, score LONG, id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamTopK.admissions(stream, "g", "score", "id", k = 2)
      .toDF("g", "score", "id")
      .writeStream.format("memory").queryName("stopk")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table("stopk")
      .as[(Long, Long, Long)].collect().toSet
    // dominated arrival silent, improving arrival admitted
    assert(!emitted.contains((1L, 100L, 13L)))
    assert(emitted.contains((1L, 1L, 14L)))
    // the re-arrival emitted exactly once (batch 1's admission)
    val got = spark.table("stopk").as[(Long, Long, Long)].collect()
    assert(got.count(_ == (2L, 7L, 20L)) === 1)
    // reconstruction: top-2 of the admission log == full batch top-2
    val all = Seq((1L, 5L, 10L), (1L, 3L, 11L), (1L, 9L, 12L),
      (2L, 7L, 20L), (1L, 100L, 13L), (1L, 1L, 14L), (2L, 2L, 21L))
    def top2(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
      rows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (r._2, r._3)).take(2)
      }.toSet
    assert(top2(emitted.toSeq) === top2(all))
    // and the operator's log equals the batch TopK operator's answer
    val batchTop = graft.ops.TopK
      .perGroup(all.toDF("g", "score", "id"), "g",
        struct(col("score"), col("id")), 2)
      .select(col("g"), col("key.score"), col("key.id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(top2(emitted.toSeq) === batchTop)
  }
}
