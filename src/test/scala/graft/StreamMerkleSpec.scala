package graft

import graft.streaming.StreamMerkle
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Drain == batch q324 level-0 signatures; the batch-id gate makes a
  * replay a no-op; and the same rows under a NEW id corrupt — xor is
  * self-inverse, not idempotent, which is WHY the gate exists. */
class StreamMerkleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val NShards = 32

  test("drain == batch level-0 signatures; restarted drain (same " +
    "batch ids) is a no-op") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val src = Files.createTempDirectory("smk-src").toString
    (0 until 3).foreach { j =>
      docs.filter(pmod(col("doc_id"), lit(3)) === j)
        .coalesce(1).write.parquet(s"$src/b$j.parquet")
    }
    val store = Files.createTempDirectory("smk").toString + "/m.txt"
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
      val q = StreamMerkle.run(stream.toDF(), NShards, store,
        Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val (applied, sigs, ns) = StreamMerkle.readStore(store, NShards)
    assert(applied === 2L)

    val batch = SparkEntry.queries("q324_merkle_levels")(spark, dir)
      .filter(col("level") === 0)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2.toInt -> (r._3, r._4)).toMap
    (0 until NShards).foreach { i =>
      val (bs, bn) = batch.getOrElse(i, (0L, 0L))
      assert(sigs(i) === bs, s"shard $i signature != batch q324")
      assert(ns(i) === bn, s"shard $i count != batch q324")
    }

    // a fresh query re-reads the same files with the SAME batch ids:
    // the gate must make the whole second drain a no-op
    drain()
    val (a2, s2, n2) = StreamMerkle.readStore(store, NShards)
    assert(a2 === applied && s2.toSeq === sigs.toSeq &&
      n2.toSeq === ns.toSeq, "replay with the gate must be a no-op")
  }

  test("without the gate, re-applying rows cancels their bits — the " +
    "self-inverse hazard the gate prevents") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").limit(10)
    val store = Files.createTempDirectory("smk2").toString + "/m.txt"
    StreamMerkle.applyBatch(docs, 0L, NShards, store, gate = true)
    val (_, once, nOnce) = StreamMerkle.readStore(store, NShards)
    assert(once.exists(_ != 0L))
    // same rows, new id, gate bypassed: every contributed bit flips
    // back to zero and the counts double — both wrong
    StreamMerkle.applyBatch(docs, 1L, NShards, store, gate = false)
    val (_, twice, nTwice) = StreamMerkle.readStore(store, NShards)
    assert(twice.forall(_ === 0L),
      "xor must cancel on double apply — if not, the hazard test is wrong")
    assert(nTwice.sum === 2 * nOnce.sum)
  }
}
