package graft

import graft.ops.{CdcChunks, Sketches}
import org.apache.spark.sql.functions._

/** Unit pins for the q183-q188 family: URL canonicalization edge
  * cases, CDC edit locality (the property that justifies the
  * operator), and the KMV estimator's accuracy/exactness regimes.
  */
class Pipeline18Spec extends SparkSpec {
  import spark.implicits._

  test("URL canonicalization: tracking params stripped, genuine params " +
    "survive in order, fragment/slash/case folded") {
    val cases = Seq(
      // (raw, expected canonical)
      ("https://a.com/x", "https://a.com/x"),
      ("https://a.com/x/", "https://a.com/x"),
      ("HTTPS://A.COM/x#frag", "https://a.com/x"),
      ("https://a.com/x?utm_source=f&utm_campaign=c", "https://a.com/x"),
      ("https://a.com/x?id=7&utm_ref=z", "https://a.com/x?id=7"),
      ("https://a.com/x?b=2&a=1", "https://a.com/x?b=2&a=1"), // order kept
      ("http://a.com/CaseSensitivePath", "http://a.com/CaseSensitivePath"),
      ("https://a.com/x?ref=tw&gclid=g&fbclid=f", "https://a.com/x"),
      ("https://a.com/", "https://a.com"))
    val got = cases.map(_._1).toDF("url")
      .select(queries.PipelineQueries18.canonicalUrl(col("url")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("CDC chunking: inserting one token re-chunks only its " +
    "neighborhood — shared chunks survive, fixed-width would shift all") {
    // 400 deterministic DISTINCT tokens (a periodic vocabulary would
    // repeat whole chunks and defeat the set comparison below);
    // insert one token at position 200
    val toks = (0 until 400).map(i => s"w${(i * 7919) % 9973}")
    val edited = (toks.take(200) :+ "INSERTED") ++ toks.drop(200)
    val docs = Seq((1L, toks.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val ch = CdcChunks.chunks(docs, "doc_id", "text")
      .select(col("doc_id"), col("ch")).as[(Long, Long)].collect()
    val a = ch.filter(_._1 == 1L).map(_._2).toSet
    val b = ch.filter(_._1 == 2L).map(_._2).toSet
    // every chunk outside the edited neighborhood is shared; the edit
    // can touch at most the one chunk containing position 200 (plus a
    // possible boundary split), so the symmetric difference is tiny
    val shared = (a intersect b).size
    assert(shared >= a.size - 2, s"edit shifted chunks: |a|=${a.size} " +
      s"|b|=${b.size} shared=$shared")
    assert((a diff b).nonEmpty, "edit changed no chunk?")
  }

  test("CDC chunking: chunk lengths partition the doc and boundaries " +
    "start at anchor tokens") {
    val toks = (0 until 300).map(i => s"t${(i * 31) % 211}")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val lens = CdcChunks.chunks(docs, "doc_id", "text")
      .agg(sum("chunk_len")).as[Long].head()
    assert(lens == 300L)
  }

  test("streaming URL dedup twin: firstSeen over the canonical URL " +
    "never re-emits a re-crawl variant; drain == batch q184 canonicals") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val src = java.nio.file.Files.createTempDirectory("surl").toString
    // batch 1: two pages; batch 2: re-crawls of page /x under tracking
    // params + case-folding, plus one genuinely new URL
    val b1 = Seq((1L, "https://a.com/x"), (2L, "https://b.com/y"))
    val b2 = Seq((3L, "HTTPS://A.COM/x#frag"),
      (4L, "https://a.com/x?utm_source=f"), (5L, "https://c.com/z"))
    b1.toDF("doc_id", "url").write.parquet(s"$src/b1.parquet")
    b2.toDF("doc_id", "url").write.parquet(s"$src/b2.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, url STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
      .withColumn("curl",
        queries.PipelineQueries18.canonicalUrl(col("url")))
    val q = graft.streaming.StreamDedup
      .firstSeen(stream, "doc_id", "curl")
      .toDF("curl_hash", "canonical_doc")
      .writeStream.format("memory").queryName("surl")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("surl").as[(String, Long)].collect().toMap
    val batch = (b1 ++ b2).toDF("doc_id", "url")
      .select(col("doc_id"),
        queries.PipelineQueries18.canonicalUrl(col("url")).as("curl"))
      .groupBy(md5(col("curl")).as("curl_hash"))
      .agg(min("doc_id").as("canonical_doc"))
      .as[(String, Long)].collect().toMap
    assert(got === batch)
    assert(got.values.toSet === Set(1L, 2L, 5L)) // 3 and 4 deduped
  }

  test("KMV estimate: within 25% on a 10k-distinct synthetic set, " +
    "exact below k") {
    val k = 256
    // 10k distinct strings -> 32-bit hashes (collisions negligible)
    val hashes = (0 until 10000).map(i => s"v$i").toDF("t")
      .select(graft.functions.TextAnalysis.tokenHash(col("t")).as("h"))
      .distinct()
    val n = hashes.count()
    val sk = hashes.agg(slice(sort_array(collect_list(col("h"))), 1, k)
      .as("sk"))
    val est = sk.select(Sketches.kmvEstimate(col("sk"), k)).as[Long].head()
    assert(math.abs(est - n) < n / 4, s"KMV est $est vs exact $n")
    // sub-k regime: the sketch IS the set
    val small = (0 until 100).map(i => s"s$i").toDF("t")
      .select(graft.functions.TextAnalysis.tokenHash(col("t")).as("h"))
      .distinct()
    val nSmall = small.count()
    val estSmall = small
      .agg(slice(sort_array(collect_list(col("h"))), 1, k).as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), k)).as[Long].head()
    assert(estSmall == nSmall)
  }
}
