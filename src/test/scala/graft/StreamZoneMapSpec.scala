package graft

import graft.streaming.StreamZoneMap
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Drain == batch for the streaming zone map, plus the OR-algebra
  * idempotence claim: replaying the whole stream changes nothing.
  */
class StreamZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("drained zone map == the batch bit_or masks; replay is a " +
    "no-op by algebra") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val sources = docs.select("source").distinct()
      .as[String].collect().toSeq

    val src = Files.createTempDirectory("szm-src").toString
    (0 until 3).foreach { j =>
      docs.filter(pmod(col("doc_id"), lit(3)) === j)
        .coalesce(1).write.parquet(s"$src/b$j.parquet")
    }
    val store = Files.createTempDirectory("szm-store").toString + "/z.txt"
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, source STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*.parquet")
      val q = StreamZoneMap.run(stream, sources, 32, store,
        Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val got = StreamZoneMap.readStore(store, 32)

    // batch twin: the same mask aggregation in one pass
    val sidx = sources.sorted.zipWithIndex.toMap
    val expected = new Array[Long](32)
    docs.as[(Long, String)].collect().foreach { case (id, s) =>
      val shard =
        (graft.functions.TextAnalysis.md5Hex8(s"zm:$id") % 32L).toInt
      expected(shard) |= 1L << sidx(s)
    }
    assert(got.toSeq === expected.toSeq)

    // replay: no checkpoint → every file reprocesses; OR is idempotent
    drain()
    assert(StreamZoneMap.readStore(store, 32).toSeq === expected.toSeq)
  }
}
