package graft

import graft.queries.PipelineQueries2
import graft.streaming.StreamMix
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Streaming token-budget admission: single-batch drain must equal the
  * batch operator (q84); multi-batch admission must be a greedy
  * arrival-order prefix with cross-batch state.
  */
class StreamMixSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docsWithTokens = Tables.documents(spark, dir)
    .select(col("doc_id"), col("source"),
      size(graft.functions.TextAnalysis.tokens(col("text")))
        .cast("long").as("n_tokens"))

  test("single-batch stream == batch q84") {
    val src = Files.createTempDirectory("smix1").toString
    docsWithTokens.write.parquet(s"$src/all.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, n_tokens LONG")
      .parquet(s"$src/*.parquet")
    val q = StreamMix.tokenBudget(stream, "doc_id", "source", "n_tokens", 400L)
      .toDF("doc_id", "source", "n_tokens", "prev_tokens")
      .writeStream.format("memory").queryName("smix1")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("smix1")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val batch = PipelineQueries2.defs.find(_.name == "q84_token_budget_mix")
      .get.fn(spark, dir)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("multi-batch admission is greedy arrival-order with carried state") {
    val src = Files.createTempDirectory("smix2").toString
    // split by doc_id parity; b1 lands first (file order = mtime order)
    val all = docsWithTokens
    all.filter(col("doc_id") % 2 === 0).write.parquet(s"$src/b1.parquet")
    Thread.sleep(1100) // parquet file mtimes are second-granular
    all.filter(col("doc_id") % 2 === 1).write.parquet(s"$src/b2.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, n_tokens LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamMix.tokenBudget(stream, "doc_id", "source", "n_tokens", 400L)
      .toDF("doc_id", "source", "n_tokens", "prev_tokens")
      .writeStream.format("memory").queryName("smix2")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("smix2")
      .as[(Long, String, Long, Long)].collect().toSeq
    // expected: replay the greedy fold over batch 1 then batch 2, each
    // batch internally in (hash, id) order — the operator's contract
    def h(id: Long) = graft.functions.TextAnalysis.md5Hex8(s"mix:$id")
    val rows = all.as[(Long, String, Long)].collect()
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val used = scala.collection.mutable.Map.empty[String, Long]
    val expect = Seq.newBuilder[(Long, String, Long, Long)]
    Seq(b1, b2).foreach { batch =>
      batch.sortBy(r => (h(r._1), r._1)).foreach { case (id, s, n) =>
        val u = used.getOrElse(s, 0L)
        if (u < 400L) { expect += ((id, s, n, u)); used(s) = u + n }
      }
    }
    assert(got.sortBy(_._1).toSeq == expect.result().sortBy(_._1).toSeq)
    // state carried: batch-2 admissions start at batch-1's used counts,
    // so per-source prev_tokens are strictly increasing in arrival order
    got.groupBy(_._2).foreach { case (_, rs) =>
      val prevs = rs.sortBy(_._4).map(_._4)
      assert(prevs == prevs.distinct.sorted)
    }
  }
}
