package graft

import graft.ops.Dedup
import graft.streaming.StreamSplit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import scala.util.Random

/** Streaming cluster-consistent split: near-dup cluster members
  * arriving in DIFFERENT micro-batches must land in the same split
  * (the q258 invariant, held at arrival time), and a full replay of
  * the stream appends nothing to the store.
  */
class StreamSplitSpec extends SparkSpec {
  import spark.implicits._

  test("cluster members spread across batches share one split; zero " +
    "near-dup straddle; replay is a no-op") {
    val rnd = new Random(42)
    val vocab = (0 until 80).map(i => s"w$i")
    def base(): Seq[String] =
      Seq.fill(20)(vocab(rnd.nextInt(vocab.size)))
    val clusterBases = (0 until 6).map(_ => base())
    // member (c, j): id 100c + j, 90% shingle overlap within cluster
    val members = for (c <- 0 until 6; j <- 0 until 3)
      yield (100L * c + j, (clusterBases(c) :+ s"uniq_${c}_$j").mkString(" "))
    val singles = (0 until 10).map(i => (1000L + i, base().mkString(" ")))
    val all = members ++ singles

    // batch j carries member j of every cluster + a third of singles:
    // every cluster straddles all three micro-batches
    val src = Files.createTempDirectory("ssplit-src").toString
    val store = Files.createTempDirectory("ssplit-store").toString + "/st"
    (0 until 3).foreach { j =>
      (members.filter(_._1 % 100 == j) ++ singles.filter(_._1 % 3 == j))
        .toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*.parquet")
      val q = StreamSplit.run(stream, store, Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val assigned = spark.read.parquet(store)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(assigned.size === all.size, "every doc assigned exactly once")

    // the q258 invariant at arrival time: no near-dup pair straddles
    val pairs = Dedup.nearDupMinhash(all.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must actually contain near-dups")
    val straddled = pairs.filter { case (a, b) =>
      assigned(a) != assigned(b)
    }
    assert(straddled.isEmpty,
      s"near-dup pairs straddle splits: ${straddled.take(5).toSeq}")
    // and the planted clusters each share exactly one split
    (0 until 6).foreach { c =>
      val splits = (0 until 3).map(j => assigned(100L * c + j)).toSet
      assert(splits.size === 1, s"cluster $c split across $splits")
    }

    // full replay (no checkpoint → all files reprocess): insert-ignore
    // makes every append empty
    drain()
    val after = spark.read.parquet(store).count()
    assert(after === all.size.toLong,
      s"replay appended rows: $after != ${all.size}")

    // --- compaction/retention (r12 verdict #6) ---
    def nParts = {
      val d = java.nio.file.Paths.get(store)
      val s = java.nio.file.Files.list(d)
      try {
        var n = 0
        s.iterator().forEachRemaining { p =>
          val nm = p.getFileName.toString
          if (nm.startsWith("part-") && nm.endsWith(".parquet")) n += 1
        }
        n
      } finally s.close()
    }
    assert(nParts > 1, "fixture must be fragmented before compaction")
    val beforeMap = assigned
    assert(StreamSplit.compact(spark, store), "compaction must rewrite")
    val compacted = spark.read.parquet(store)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(compacted === beforeMap,
      "compaction must preserve every (doc_id -> split) label")
    assert(nParts === 1,
      s"store this small must compact to one file, got $nParts")
    // a store already at its quota refuses to rewrite
    assert(!StreamSplit.compact(spark, store), "second compact is a no-op")
  }

  test("store stays bounded under a long fragmented replay: the " +
    "in-loop trigger compacts and labels never move") {
    val docs = (0 until 12).map(i =>
      (i.toLong, (0 until 20).map(j => s"t${i}_$j").mkString(" ")))
    val src = Files.createTempDirectory("ssplit2-src").toString
    val store = Files.createTempDirectory("ssplit2-store").toString + "/st"
    docs.zipWithIndex.foreach { case (d, i) =>
      Seq(d).toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$src/b$i.parquet")
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*.parquet")
      val q = StreamSplit.run(stream, store, Trigger.AvailableNow(),
        compactAfterFiles = 4).start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(store)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first.size === docs.size)
    // replay the whole stream twice more: every batch appends zero
    // rows but still writes files — the trigger must keep the store's
    // part count bounded near the trigger line, and labels must not
    // move across the repeated compactions
    drain(); drain()
    def nParts = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(store))
      try {
        var n = 0
        s.iterator().forEachRemaining { p =>
          val nm = p.getFileName.toString
          if (nm.startsWith("part-") && nm.endsWith(".parquet")) n += 1
        }
        n
      } finally s.close()
    }
    assert(nParts <= 5,
      s"36 appends must not fragment past the trigger: $nParts files")
    val after = spark.read.parquet(store)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(after === first, "labels moved across compactions")
  }

  test("per-batch cleanup frees only this batch's blocks: a foreign " +
    "localCheckpoint in the shared session survives the drain") {
    // localCheckpoint truncates lineage, so an unpersist-everything
    // cleanup (the pre-fix behavior) makes this frame unrecoverable
    // ('checkpoint block not found') the moment the follower's first
    // batch finishes. The frame must still be readable afterwards.
    val foreign = (0 until 100).map(i => (i.toLong, s"doc $i"))
      .toDF("id", "t").localCheckpoint()
    assert(foreign.count() === 100L)

    val src = Files.createTempDirectory("ssplit-src2").toString
    val store = Files.createTempDirectory("ssplit-store2").toString + "/st"
    (0 until 2).foreach { j =>
      Seq((10L + j, s"some text body number $j"))
        .toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamSplit.run(stream, store, Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(store).count() === 2L)

    // the foreign frame's blocks must still be resident and readable
    assert(foreign.count() === 100L,
      "follower cleanup unpersisted a foreign localCheckpoint")
    foreign.unpersist(blocking = false)
  }
}
