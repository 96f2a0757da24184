package graft

import graft.ops.{NswIndex, VectorSearch}
import graft.streaming.StreamNswInsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import scala.util.Random

/** The maintained NSW graph: search recall over the incrementally
  * inserted graph matches the statically rebuilt graph, replay is a
  * no-op (per-batch partition overwrite + meta gate), poison rows are
  * dropped, and per-insert degree growth is bounded. Slicing
  * invariance is NOT claimed (insertion order matters for every
  * incremental graph index — documented in the module).
  */
class StreamNswInsertSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val m = 4
  private val beam = 8
  private val rounds = 3
  private val probes = 2

  private def randUnit(rnd: Random, d: Int): Array[Double] = {
    val v = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def df(rows: Seq[(Long, Array[Double])]): DataFrame =
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

  // clustered corpus: 5 tight clusters × 24 members, ids interleaved
  // so every batch touches every cluster
  private val rnd = new Random(61)
  private val centers = Array.fill(5)(randUnit(rnd, dims))
  private val corpus: Seq[(Long, Array[Double])] =
    (0 until 120).map { i =>
      val c = centers(i % 5)
      val noise = randUnit(rnd, dims).map(_ * 0.15)
      val v = c.zip(noise).map { case (a, b) => a + b }
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }
  private val cents = VectorSearch.kmeansCentroids(
    corpus.map(_._2).toArray, k = 8, iters = 6, seed = 42L)

  private def freshStore(): String =
    Files.createTempDirectory("nswins").toString + "/g"

  private def insertAll(store: String, nBatches: Int): Unit =
    (0 until nBatches).foreach { b =>
      StreamNswInsert.applyBatch(
        df(corpus.filter(_._1 % nBatches == b)), b.toLong,
        "vec_id", "embedding", cents, probes, m, beam, rounds, store)
    }

  /** Exact top-k neighbor ids of `q` by cosine over the corpus. */
  private def exactTop(q: Array[Double], k: Int): Set[Long] = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    corpus.map { case (id, v) =>
      val d = v.zip(q).map { case (a, b) => a * b }.sum
      (-d / (qn * math.sqrt(v.map(x => x * x).sum)), id)
    }.sorted.take(k).map(_._2).toSet
  }

  private def searchTop(store: String, q: Array[Double], k: Int)
      : Set[Long] = {
    val vecs = StreamNswInsert.nodes(spark, store)
      .withColumn("nrm", VectorSearch.norm(col("v")))
      .localCheckpoint()
    val qdf = Seq(q.toSeq).toDF("qv")
      .withColumn("qn", VectorSearch.norm(col("qv")))
    val entries = vecs.agg(min("id").as("id"))
    NswIndex.beamSearch(vecs, StreamNswInsert.edges(spark, store),
        qdf, entries, beamWidth = beam, rounds = rounds)
      .orderBy(col("sim").desc, col("id").asc).limit(k)
      .select("id").as[Long].collect().toSet
  }

  test("recall over the incrementally maintained graph matches the " +
    "statically rebuilt graph; replay of any batch is a no-op") {
    val store = freshStore()
    insertAll(store, nBatches = 4)
    assert(StreamNswInsert.nodes(spark, store).count() === 120L)

    // static twin: one knnGraph over the full corpus
    val staticEdges = NswIndex.knnGraph(
      df(corpus).select(col("vec_id").as("id"),
        VectorSearch.toDouble(col("embedding")).as("v")),
      "id", "v", cents, probes, m, NswIndex.DefaultBlockCap)
      .localCheckpoint()
    val vecsAll = df(corpus).select(col("vec_id").cast("long").as("id"),
        VectorSearch.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorSearch.norm(col("v")))
      .localCheckpoint()
    val queries = (0 until 8).map(_ => randUnit(new Random(77), dims))
      .zipWithIndex.map { case (q, i) =>
        val c = centers(i % 5)
        val v = c.zip(q.map(_ * 0.2)).map { case (a, b) => a + b }
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
    var incHits = 0
    var staticHits = 0
    queries.foreach { q =>
      val exact = exactTop(q, 10)
      incHits += (exact & searchTop(store, q, 10)).size
      val qdf = Seq(q.toSeq).toDF("qv")
        .withColumn("qn", VectorSearch.norm(col("qv")))
      val st = NswIndex.beamSearch(vecsAll, staticEdges, qdf,
          vecsAll.agg(min("id").as("id")), beamWidth = beam,
          rounds = rounds)
        .orderBy(col("sim").desc, col("id").asc).limit(10)
        .select("id").as[Long].collect().toSet
      staticHits += (exact & st).size
    }
    info(s"recall@10 over 8 queries: incremental=$incHits static=$staticHits")
    assert(incHits >= staticHits - 8,
      s"maintained graph lost more than 1 hit/query vs static: " +
        s"$incHits vs $staticHits")
    assert(incHits >= 40, s"absolute recall floor broken: $incHits/80")

    // replay: re-apply an old batch — gated, nothing changes
    val edgesBefore = StreamNswInsert.edges(spark, store).count()
    StreamNswInsert.applyBatch(df(corpus.filter(_._1 % 4 == 1)), 1L,
      "vec_id", "embedding", cents, probes, m, beam, rounds, store)
    assert(StreamNswInsert.edges(spark, store).count() === edgesBefore)
    assert(StreamNswInsert.nodes(spark, store).count() === 120L)
  }

  test("poison rows are dropped; per-batch degree growth is bounded; " +
    "the streaming wiring drains the same store the batch API builds") {
    val store = freshStore()
    // batch 0 via the real stream wiring
    val src = Files.createTempDirectory("nswins-src").toString
    (0 until 3).foreach { b =>
      df(corpus.filter(_._1 % 3 == b)).coalesce(1)
        .write.parquet(s"$src/b$b.parquet")
    }
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamNswInsert.run(stream, "vec_id", "embedding", cents,
      probes, m, beam, rounds, store, Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(StreamNswInsert.nodes(spark, store).count() === 120L)

    // poison batch: null vector, wrong dims, and a duplicate id —
    // must not throw, must not add nodes beyond the one valid new row
    val poison = df(Seq((500L, randUnit(rnd, dims))))
      .unionByName(Seq((501L, None: Option[Seq[Double]]))
        .toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
      .unionByName(df(Seq((0L, randUnit(rnd, dims))))) // dup of node 0
    StreamNswInsert.applyBatch(poison, 99L, "vec_id", "embedding",
      cents, probes, m, beam, rounds, store)
    val n = StreamNswInsert.nodes(spark, store)
    assert(n.count() === 121L, "only the valid new row may insert")
    assert(n.filter(col("id") === 0L).count() === 1L,
      "a re-sent id must not duplicate")

    // degree bound: node 500 joined via ≤ m intra (none: alone in its
    // batch) + m cross out-edges, symmetrized
    val deg500 = StreamNswInsert.edges(spark, store)
      .filter(col("src") === 500L).count()
    assert(deg500 >= 1L && deg500 <= 2L * m,
      s"insert degree out of bounds: $deg500")
  }

  test("write-time sidecars reproduce the scan fingerprint (the " +
    "O(#batches) managed-store staleness path), and compaction " +
    "preserves rows, fingerprint, and recall while bounding the " +
    "file count — with crash recovery at every rename point") {
    import graft.ops.ArtifactStore
    val store = freshStore()
    insertAll(store, nBatches = 6)
    // 1. sidecar fold == full-scan fingerprint, for every sub-store
    ArtifactStore.clearFingerprintMemo()
    Seq("vecs" -> StreamNswInsert.nodes(spark, store),
      "edges" -> StreamNswInsert.edges(spark, store),
      "edges1" -> StreamNswInsert.edges1(spark, store))
      .foreach { case (sub, view) =>
        assert(StreamNswInsert.storeFingerprint(store, sub) ===
          ArtifactStore.fingerprint(view, s"nswspec:$store:$sub"),
          s"$sub sidecar fold must equal the scan fingerprint")
      }
    val nodesBefore = StreamNswInsert.nodes(spark, store)
      .as[(Long, Seq[Double])].collect().toSet
    val edgesBefore = StreamNswInsert.edges(spark, store)
      .as[(Long, Long)].collect().toSet
    val e1Before = StreamNswInsert.edges1(spark, store)
      .as[(Long, Long)].collect().toSet
    val fpBefore = StreamNswInsert.storeFingerprint(store, "edges")
    val q = randUnit(new Random(5), dims)
    val topBefore = searchTop(store, q, 10)

    // 2. compact: byte-identical committed reads, fp unchanged,
    // bounded partition-dir count
    assert(StreamNswInsert.compact(spark, store), "must rewrite")
    def bidDirs(sub: String) = {
      val d = java.nio.file.Paths.get(s"$store/$sub")
      val s = Files.list(d)
      try s.filter(p => p.getFileName.toString.startsWith("bid="))
        .count().toInt
      finally s.close()
    }
    assert(bidDirs("vecs") === 1 && bidDirs("edges") === 1 &&
      bidDirs("edges1") === 1, "compaction must collapse to one dir")
    assert(StreamNswInsert.nodes(spark, store)
      .as[(Long, Seq[Double])].collect().toSet === nodesBefore)
    assert(StreamNswInsert.edges(spark, store)
      .as[(Long, Long)].collect().toSet === edgesBefore)
    assert(StreamNswInsert.edges1(spark, store)
      .as[(Long, Long)].collect().toSet === e1Before)
    assert(StreamNswInsert.storeFingerprint(store, "edges") === fpBefore,
      "compaction moves bytes, never rows — fp must not change")
    assert(searchTop(store, q, 10) === topBefore,
      "search over the compacted store must be identical")

    // 3. crash between the two renames: dir at .compact.old only —
    // the next reader heals it and reads the SAME rows
    val vdir = java.nio.file.Paths.get(s"$store/vecs")
    java.nio.file.Files.move(vdir,
      java.nio.file.Paths.get(s"$store/vecs.compact.old"))
    assert(StreamNswInsert.nodes(spark, store)
      .as[(Long, Seq[Double])].collect().toSet === nodesBefore,
      "recovery must restore the pre-rename store")

    // 4. inserts after compaction land normally and the fold tracks
    StreamNswInsert.applyBatch(df(Seq((900L, randUnit(rnd, dims)))),
      50L, "vec_id", "embedding", cents, probes, m, beam, rounds, store)
    assert(StreamNswInsert.nodes(spark, store).count() === 121L)
    ArtifactStore.clearFingerprintMemo()
    assert(StreamNswInsert.storeFingerprint(store, "edges") ===
      ArtifactStore.fingerprint(StreamNswInsert.edges(spark, store),
        s"nswspec2:$store:edges"),
      "post-compaction inserts must keep the fold == scan contract")
  }

  test("the maintained graph serves through the ArtifactStore: " +
    "served rows == committed view, the builder runs once, and a " +
    "maintained-content change re-addresses the artifact") {
    import graft.ops.ArtifactStore
    val store = freshStore()
    insertAll(store, nBatches = 3)
    val root = Files.createTempDirectory("nsw-art").toString
    spark.conf.set(ArtifactStore.RootConf, root)
    try {
      val want = StreamNswInsert.edges(spark, store)
        .as[(Long, Long)].collect().toSet
      val served = StreamNswInsert.serveGraph(spark, store)
        .as[(Long, Long)].collect().toSet
      assert(served === want, "served graph must equal the view")
      // the serve plan reads the ARTIFACT parquet, not the bid store
      val plan = StreamNswInsert.serveGraph(spark, store)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("nsw_maintained_edges"),
        s"serve must read the committed artifact:\n$plan")
      // new content → new address → rebuild reflects the insert
      StreamNswInsert.applyBatch(df(Seq((901L, randUnit(rnd, dims)))),
        60L, "vec_id", "embedding", cents, probes, m, beam, rounds,
        store)
      val served2 = StreamNswInsert.serveGraph(spark, store)
        .as[(Long, Long)].collect().toSet
      val want2 = StreamNswInsert.edges(spark, store)
        .as[(Long, Long)].collect().toSet
      assert(served2 === want2,
        "a maintained-content change must re-address and rebuild")
      assert(served2 !== served, "the insert must be visible")
      // PART-ADDRESSED serve (r14): each committed batch is its own
      // artifact part, so the append above rebuilt ONE new part and
      // every original payload was reused verbatim (same payload dir)
      def payloads(): Map[String, String] = {
        def ls(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
          val s = Files.list(p)
          try { val b = Seq.newBuilder[java.nio.file.Path]
            s.iterator().forEachRemaining(c => b += c); b.result() }
          finally s.close()
        }
        val name = java.nio.file.Paths.get(s"$root/nsw_maintained_edges")
        ls(name).flatMap(scope => ls(scope.resolve("parts")))
          .flatMap { part => ls(part).map { fp =>
            part.getFileName.toString ->
              ls(fp).map(_.getFileName.toString)
                .filter(_.startsWith("payload-")).head } }
          .toMap
      }
      val after = payloads()
      assert(after.size === 4,
        s"3 batch parts + 1 appended part expected: ${after.keys}")
      // serve once more: pure part-cache hit, payload dirs unchanged
      assert(StreamNswInsert.serveGraph(spark, store)
        .as[(Long, Long)].collect().toSet === served2)
      assert(payloads() === after, "a re-serve must not rebuild parts")
      // compaction collapses the part set; the next committing serve
      // rebuilds ONE rollup part and vacuums the departed batch parts
      assert(StreamNswInsert.compact(spark, store), "must rewrite")
      assert(StreamNswInsert.serveGraph(spark, store)
        .as[(Long, Long)].collect().toSet === want2,
        "compaction moves bytes, never rows")
      assert(payloads().size === 1,
        "departed batch parts must vacuum after the rollup serve")
    } finally spark.conf.unset(ArtifactStore.RootConf)
  }

  test("two-layer ladder (r13 verdict #5): the incrementally " +
    "maintained layer-1 graph preserves the coarse-entry descent — " +
    "maintained-ladder recall >= the static two-layer build's") {
    val store = freshStore()
    insertAll(store, nBatches = 4)
    // membership is the pure id hash, so maintained layer-1 nodes ==
    // static layer-1 nodes by construction
    val lvl1Ids = corpus.map(_._1).filter { id =>
      // evaluate the house hash the same way atLevel does
      spark.range(1).select(
        NswIndex.atLevel(lit(id), 1).as("m")).head().getBoolean(0)
    }.toSet
    val e1 = StreamNswInsert.edges1(spark, store)
      .as[(Long, Long)].collect()
    assert(e1.nonEmpty, "layer-1 graph must be maintained")
    assert(e1.forall { case (s, d) =>
      lvl1Ids.contains(s) && lvl1Ids.contains(d) },
      "layer-1 edges must stay within the level-1 subset")

    // static two-layer twin on the same corpus
    val all = df(corpus).select(col("vec_id").cast("long").as("id"),
        VectorSearch.toDouble(col("embedding")).as("v"))
      .localCheckpoint()
    val vecsAll = all.withColumn("nrm", VectorSearch.norm(col("v")))
      .localCheckpoint()
    val static0 = NswIndex.knnGraph(all, "id", "v", cents, probes, m,
      NswIndex.DefaultBlockCap).localCheckpoint()
    val static1 = NswIndex.knnGraph(
      all.where(NswIndex.atLevel(col("id"), 1)), "id", "v", cents,
      probes, m, NswIndex.DefaultBlockCap).localCheckpoint()
    val topRounds = 2
    var maintainedHits = 0
    var staticHits = 0
    val queries = (0 until 8).map { i =>
      val c = centers(i % 5)
      val n0 = randUnit(new Random(400 + i), dims).map(_ * 0.2)
      val v = c.zip(n0).map { case (a, b) => a + b }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    queries.foreach { q =>
      val exact = exactTop(q, 10)
      val qdf = Seq(q.toSeq).toDF("qv")
        .withColumn("qn", VectorSearch.norm(col("qv")))
      val maint = StreamNswInsert.searchLadder(spark, store, qdf,
          beamWidth = beam, topRounds = topRounds, rounds = rounds)
        .orderBy(col("sim").desc, col("id").asc).limit(10)
        .select("id").as[Long].collect().toSet
      maintainedHits += (exact & maint).size
      val entry1 = all.where(NswIndex.atLevel(col("id"), 1))
        .agg(min("id").as("id"))
      val sBeam1 = NswIndex.beamSearch(vecsAll, static1, qdf, entry1,
        beamWidth = beam, rounds = topRounds)
      val st = NswIndex.beamSearch(vecsAll, static0, qdf,
          sBeam1.select(col("id")), beamWidth = beam, rounds = rounds)
        .orderBy(col("sim").desc, col("id").asc).limit(10)
        .select("id").as[Long].collect().toSet
      staticHits += (exact & st).size
    }
    info(s"two-layer recall@10 over 8 queries: " +
      s"maintained=$maintainedHits static=$staticHits (of 80)")
    assert(maintainedHits >= staticHits,
      s"maintained ladder must not trail the static build: " +
        s"$maintainedHits vs $staticHits")
    assert(maintainedHits >= 40,
      s"absolute two-layer recall floor broken: $maintainedHits/80")
  }

  test("three-layer ladder (r14 verdict #6): layer 2 is maintained " +
    "like layer 1 one rung up, its edges stay within the 4^-2 " +
    "subset, and the 2->1->0 descent's recall does not trail the " +
    "1->0 descent on a corpus where layer 2 is populated") {
    // a larger corpus so the 1/16 draw lands enough nodes for layer 2
    // to be a real graph, not a singleton
    val rnd2 = new Random(83)
    val corpus2: Seq[(Long, Array[Double])] = (0 until 320).map { i =>
      val c = centers(i % 5)
      val noise = randUnit(rnd2, dims).map(_ * 0.15)
      val v = c.zip(noise).map { case (a, b) => a + b }
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }
    val store = freshStore()
    (0 until 4).foreach { b =>
      StreamNswInsert.applyBatch(
        df(corpus2.filter(_._1 % 4 == b)), b.toLong,
        "vec_id", "embedding", cents, probes, m, beam, rounds, store)
    }
    val nodes = StreamNswInsert.nodes(spark, store).localCheckpoint()
    val lvl2Ids = nodes.where(NswIndex.atLevel(col("id"), 2))
      .select("id").as[Long].collect().toSet
    assert(lvl2Ids.size >= 5,
      s"the 320-corpus must populate layer 2 (got ${lvl2Ids.size})")
    val e2 = StreamNswInsert.edges2(spark, store)
      .as[(Long, Long)].collect()
    assert(e2.nonEmpty, "layer-2 graph must be maintained")
    assert(e2.forall { case (s, d) =>
      lvl2Ids.contains(s) && lvl2Ids.contains(d) },
      "layer-2 edges must stay within the level-2 subset")

    val vecsAll = nodes.withColumn("nrm", VectorSearch.norm(col("v")))
      .localCheckpoint()
    def exact2(q: Array[Double], k: Int): Set[Long] = {
      val qn = math.sqrt(q.map(x => x * x).sum)
      corpus2.map { case (id, v) =>
        val dot = v.zip(q).map { case (a, b) => a * b }.sum
        val n = math.sqrt(v.map(x => x * x).sum)
        id -> dot / (n * qn)
      }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }
    val topRounds = 2
    var three = 0
    var two = 0
    (0 until 8).foreach { i =>
      val c = centers(i % 5)
      val n0 = randUnit(new Random(700 + i), dims).map(_ * 0.2)
      val v = c.zip(n0).map { case (a, b) => a + b }
      val nn = math.sqrt(v.map(x => x * x).sum)
      val q = v.map(_ / nn)
      val exact = exact2(q, 10)
      val qdf = Seq(q.toSeq).toDF("qv")
        .withColumn("qn", VectorSearch.norm(col("qv")))
      // 3-layer: searchLadder's own descent (starts at layer 2 here)
      val got3 = StreamNswInsert.searchLadder(spark, store, qdf,
          beamWidth = beam, topRounds = topRounds, rounds = rounds)
        .orderBy(col("sim").desc, col("id").asc).limit(10)
        .select("id").as[Long].collect().toSet
      three += (exact & got3).size
      // 2-layer twin over the SAME maintained store: min-id layer-1
      // entry, no layer-2 descent
      val entry1 = nodes.where(NswIndex.atLevel(col("id"), 1))
        .agg(min("id").as("id"))
      val b1 = NswIndex.beamSearch(vecsAll,
        StreamNswInsert.edges1(spark, store), qdf, entry1,
        beamWidth = beam, rounds = topRounds)
      val got2 = NswIndex.beamSearch(vecsAll,
          StreamNswInsert.edges(spark, store), qdf,
          b1.select(col("id")), beamWidth = beam, rounds = rounds)
        .orderBy(col("sim").desc, col("id").asc).limit(10)
        .select("id").as[Long].collect().toSet
      two += (exact & got2).size
    }
    info(s"three- vs two-layer recall@10 over 8 queries: " +
      s"3layer=$three 2layer=$two (of 80)")
    assert(three >= two,
      s"the layer-2 descent must not trail the two-layer one: " +
        s"$three vs $two")
    assert(three >= 40, s"absolute recall floor broken: $three/80")
  }

  test("seeded entry ladder (r15 verdict #7 — q392's multi-probe " +
    "entry seeding on the MAINTAINED store): widening each descent " +
    "stage's entries with their 1-hop neighbors must not trail the " +
    "unseeded ladder, and must hold the static-build recall floor") {
    val store = freshStore()
    insertAll(store, 4)
    // the static twin's recall on the same corpus (min-id layer-1
    // entry, the two-layer shape)
    val all = df(corpus).select(col("vec_id").cast("long").as("id"),
        VectorSearch.toDouble(col("embedding")).as("v"))
      .localCheckpoint()
    val vecsAll = all.withColumn("nrm", VectorSearch.norm(col("v")))
      .localCheckpoint()
    val static0 = NswIndex.knnGraph(all, "id", "v", cents, probes, m,
      NswIndex.DefaultBlockCap).localCheckpoint()
    val static1 = NswIndex.knnGraph(
      all.where(NswIndex.atLevel(col("id"), 1)), "id", "v", cents,
      probes, m, NswIndex.DefaultBlockCap).localCheckpoint()
    var seeded = 0
    var unseeded = 0
    var static2 = 0
    (0 until 8).foreach { i =>
      val c = centers(i % 5)
      val n0 = randUnit(new Random(900 + i), dims).map(_ * 0.2)
      val v = c.zip(n0).map { case (a, b) => a + b }
      val nn = math.sqrt(v.map(x => x * x).sum)
      val q = v.map(_ / nn)
      val exact = exactTop(q, 10)
      val qdf = Seq(q.toSeq).toDF("qv")
        .withColumn("qn", VectorSearch.norm(col("qv")))
      def top(df: DataFrame): Set[Long] = df
        .orderBy(col("sim").desc, col("id").asc).limit(10)
        .select("id").as[Long].collect().toSet
      seeded += (exact & top(StreamNswInsert.searchLadder(spark,
        store, qdf, beamWidth = beam, topRounds = 2, rounds = rounds,
        seedEntries = true))).size
      unseeded += (exact & top(StreamNswInsert.searchLadder(spark,
        store, qdf, beamWidth = beam, topRounds = 2,
        rounds = rounds))).size
      val entry1 = all.where(NswIndex.atLevel(col("id"), 1))
        .agg(min("id").as("id"))
      val sBeam1 = NswIndex.beamSearch(vecsAll, static1, qdf, entry1,
        beamWidth = beam, rounds = 2)
      static2 += (exact & top(NswIndex.beamSearch(vecsAll, static0,
        qdf, sBeam1.select(col("id")), beamWidth = beam,
        rounds = rounds))).size
    }
    info(s"seeded vs unseeded vs static recall@10 over 8 queries: " +
      s"seeded=$seeded unseeded=$unseeded static=$static2 (of 80)")
    assert(seeded >= unseeded,
      s"entry seeding must never cost recall: $seeded vs $unseeded")
    assert(seeded >= static2,
      s"the seeded maintained ladder must not trail the static " +
        s"build: $seeded vs $static2")
    assert(seeded >= 40, s"absolute recall floor broken: $seeded/80")
  }
}
