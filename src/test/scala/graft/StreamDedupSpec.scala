package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Cross-batch streaming dedup: a content seen in batch 1 must not be
  * re-emitted by batch 2, and the drained stream must equal the batch
  * exact-dedup operator.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming first-seen dedup across micro-batches == batch exact dedup") {
    val src = Files.createTempDirectory("sdedup").toString
    // batch 1: contents A, B; batch 2: B again (new id), C
    Seq((1L, "alpha text"), (2L, "beta text"))
      .toDF("doc_id", "text").write.parquet(s"$src/b1.parquet")
    val stream1 = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    // stage batch 2 before starting so AvailableNow drains both files
    Seq((3L, "beta text"), (4L, "gamma text"))
      .toDF("doc_id", "text").write.parquet(s"$src/b2.parquet")
    val q = StreamDedup.firstSeen(stream1.toDF(), "doc_id", "text")
      .toDF("content_hash", "canonical_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sdedup")
      .as[(String, Long)].collect().toMap
    // one row per distinct content; "beta text" attributed to its
    // first-seen id regardless of which batch carried which file
    val batch = Seq((1L, "alpha text"), (2L, "beta text"),
        (3L, "beta text"), (4L, "gamma text"))
      .toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("canonical_id"))
      .as[(String, Long)].collect().toMap
    // b1 lands before b2 (file mtime order), so "beta text" must be
    // attributed to id 2, not re-emitted for id 3
    assert(got === batch)
  }

  test("firstSeen with a TTL behaves identically while state is live") {
    // TTL far beyond the drain: semantics must match the no-TTL path
    // (expiry itself is a documented recall trade, inherently
    // wall-clock-dependent, so it is not asserted here)
    val src = Files.createTempDirectory("sdedupttl").toString
    Seq((1L, "alpha text"), (2L, "beta text"))
      .toDF("doc_id", "text").write.parquet(s"$src/b1.parquet")
    Seq((3L, "beta text"), (4L, "gamma text"))
      .toDF("doc_id", "text").write.parquet(s"$src/b2.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    // NOT AvailableNow / processAllAvailable: a registered
    // processing-time timeout keeps the query scheduling (no-data)
    // batches until the 1 h timeout would fire, so neither termination
    // nor processAllAvailable ever settles. Run a real trigger interval
    // (as production would) and poll the sink for the 3 expected rows.
    val q = StreamDedup
      .firstSeen(stream.toDF(), "doc_id", "text", ttlMillis = Some(3600L * 1000))
      .toDF("content_hash", "canonical_id")
      .writeStream.format("memory").queryName("sdedupttl")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    val deadline = System.currentTimeMillis + 120000
    while (spark.table("sdedupttl").count() < 3 &&
      System.currentTimeMillis < deadline) Thread.sleep(250)
    q.stop()
    val got = spark.table("sdedupttl").as[(String, Long)].collect().toMap
    assert(got.values.toSet === Set(1L, 2L, 4L))
    assert(got.size === 3)
  }

  test("firstSeen TTL evicts idle state: a replay after expiry is " +
    "re-emitted (the documented recall miss)") {
    val src = Files.createTempDirectory("sdedupevict").toString
    Seq((1L, "alpha text"), (2L, "beta text"))
      .toDF("doc_id", "text").write.parquet(s"$src/b1.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamDedup
      .firstSeen(stream.toDF(), "doc_id", "text", ttlMillis = Some(1500L))
      .toDF("content_hash", "canonical_id")
      .writeStream.format("memory").queryName("sdedupevict")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 120000
      while (spark.table("sdedupevict").count() < n &&
        System.currentTimeMillis < deadline) Thread.sleep(250)
      assert(spark.table("sdedupevict").count() >= n)
    }
    awaitRows(2)
    // idle well past the TTL: the timeout batch removes the state
    Thread.sleep(5000)
    // the SAME content re-arrives — with its first-seen entry evicted
    // it is re-emitted under the new id: exactly the recall trade the
    // TTL knob documents
    Seq((9L, "alpha text")).toDF("doc_id", "text")
      .write.parquet(s"$src/b2.parquet")
    awaitRows(3)
    q.stop()
    import spark.implicits._
    val got = spark.table("sdedupevict").as[(String, Long)].collect()
    val alphaCanonicals = got.filter(_._2 != 2L).map(_._2).toSet
    assert(got.length === 3)
    assert(alphaCanonicals === Set(1L, 9L),
      "alpha text must be emitted twice: once per TTL epoch")
  }

  test("near-dup band-state TTL evicts idle buckets: a near-dup " +
    "arriving after expiry is admitted (the documented recall miss)") {
    val base = (0 until 30).map(i => f"w$i%02d").mkString(" ")
    val near = (0 until 30).map(i => if (i == 29) "CHANGED" else f"w$i%02d")
      .mkString(" ")
    val other = (100 until 130).map(i => f"x$i%03d").mkString(" ")
    val nearOther = (100 until 130)
      .map(i => if (i == 129) "CHANGED" else f"x$i%03d").mkString(" ")
    val src = Files.createTempDirectory("snearttl").toString
    Seq((1L, base)).toDF("doc_id", "text")
      .write.parquet(s"$src/b1.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamDedup
      .nearDupBands(stream.toDF(), "doc_id", "text",
        ttlMillis = Some(1500L))
      .toDF("doc_id", "matched_id", "jaccard")
      .writeStream.format("memory").queryName("snearttl")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    // Idle past the TTL — but sleeping is not enough: eviction only
    // happens when a TIMEOUT BATCH actually runs (a key receiving new
    // data in the same batch as its expiry is served with the old
    // state, hasTimedOut=false — Spark's documented best-effort
    // caveat, the flake this wait closes). So wait for b1 to process,
    // then for an EMPTY batch triggered ≥ TTL+margin after it: that
    // batch is the one that removed doc 1's band state.
    val wDeadline = System.currentTimeMillis + 120000
    while (!q.recentProgress.exists(_.numInputRows > 0) &&
      System.currentTimeMillis < wDeadline) Thread.sleep(250)
    val b1Done = System.currentTimeMillis
    def evicted: Boolean = q.recentProgress.exists { p =>
      p.numInputRows == 0 && java.time.Instant.parse(p.timestamp)
        .toEpochMilli > b1Done + 2500
    }
    while (!evicted && System.currentTimeMillis < wDeadline)
      Thread.sleep(250)
    assert(evicted, "no timeout batch ran after the TTL window")
    // doc 3 is a near-dup of the EXPIRED doc 1 → admitted as novel
    // (the recall trade the TTL knob documents). Docs 5/6 are a fresh
    // in-batch near pair: their flag row is the sentinel proving the
    // batch was fully processed (an absent doc-3 row alone could just
    // mean "not processed yet").
    // coalesce(1): a multi-part write + maxFilesPerTrigger=1 would
    // split the sentinel pair across batches (part order decides
    // which of 5/6 is "prior" — a measured orientation flake)
    Seq((3L, near), (5L, other), (6L, nearOther))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/b2.parquet")
    val deadline = System.currentTimeMillis + 120000
    while (spark.table("snearttl").isEmpty &&
      System.currentTimeMillis < deadline) Thread.sleep(250)
    q.stop()
    val got = spark.table("snearttl")
      .as[(Long, Long, Double)].collect()
    // doc 3 must be ADMITTED (its band state expired) — the recall
    // trade the TTL knob documents
    assert(!got.map(_._1).contains(3L),
      s"post-TTL near-dup of doc 1 must be admitted as novel: " +
        s"${got.mkString(",")}")
    // the fresh 5/6 pair is the processed-batch sentinel; which side
    // flags is an arrival-order artifact, not part of the contract
    assert(got.nonEmpty, "sentinel pair 5/6 must flag")
    assert(got.forall(r => Set((5L, 6L), (6L, 5L)).contains((r._1, r._2))
      && r._3 >= 0.8), s"unexpected flag rows: ${got.mkString(",")}")
  }

  test("streaming near-dup bands flag cross-batch near-duplicates like batch LSH") {
    val base = (0 until 30).map(i => f"w$i%02d").mkString(" ")
    val near = (0 until 30).map(i => if (i == 29) "CHANGED" else f"w$i%02d")
      .mkString(" ")
    val other = (100 until 130).map(i => f"x$i%03d").mkString(" ")
    val other2 = (200 until 230).map(i => f"y$i%03d").mkString(" ")
    val src = Files.createTempDirectory("snear").toString
    Seq((1L, base), (2L, other)).toDF("doc_id", "text")
      .write.parquet(s"$src/b1.parquet")
    Seq((3L, near), (4L, other2)).toDF("doc_id", "text")
      .write.parquet(s"$src/b2.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamDedup.nearDupBands(stream.toDF(), "doc_id", "text")
      .toDF("doc_id", "matched_id", "jaccard")
      .writeStream.format("memory").queryName("snear")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // per-doc resolution: a doc can match in several bands
    val flagged = spark.table("snear")
      .groupBy("doc_id").agg(min("matched_id").as("matched_id"),
        max("jaccard").as("jaccard"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(flagged.keySet === Set(3L), s"only the near-dup flags: $flagged")
    assert(flagged(3L)._1 === 1L)
    assert(flagged(3L)._2 >= 0.8)
    // cross-check: the batch LSH operator finds exactly the same pair
    // on the union of both batches
    val batchPairs = graft.ops.Dedup.nearDupMinhash(
        Seq((1L, base), (2L, other), (3L, near), (4L, other2))
          .toDF("doc_id", "text"), "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((1L, 3L)))
  }
}
