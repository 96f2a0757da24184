package graft

import graft.ops.ArtifactStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** The build-vs-serve contract: build once, serve parquet, rebuild on
  * content change (fingerprint addressing), survive torn builds,
  * vacuum superseded fingerprints — and be a no-op with no root.
  */
class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-art").toString

  private def withRoot[A](root: String)(f: => A): A = {
    spark.conf.set(ArtifactStore.RootConf, root)
    try f finally spark.conf.unset(ArtifactStore.RootConf)
  }

  private def corpus(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"doc$i")).toDF("id", "body")

  private def listNames(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try {
      val b = Seq.newBuilder[String]
      s.iterator().forEachRemaining(p => b += p.getFileName.toString)
      b.result()
    } finally s.close()
  }

  /** All committed fp leaves under root/name (layout: name/scope/fp). */
  private def fpLeaves(nameDir: String): Seq[java.nio.file.Path] =
    listNames(nameDir).flatMap(scope =>
      listNames(s"$nameDir/$scope").map(fp =>
        Paths.get(s"$nameDir/$scope/$fp")))

  test("no root configured: buildOrServe is identity on the builder " +
    "(invoked every call — the historical inline shape)") {
    var builds = 0
    def run() = ArtifactStore.buildOrServe(spark, "t_noroot", "fp0", "p", "src:x") {
      builds += 1; corpus(5)
    }.count()
    assert(run() === 5 && run() === 5)
    assert(builds === 2, "without a root every call must build inline")
  }

  test("with a root: first call builds + commits, second SERVES " +
    "(builder not invoked), identical rows, manifest written last") {
    val root = freshRoot()
    var builds = 0
    def run(): Set[(Long, String)] = withRoot(root) {
      ArtifactStore.buildOrServe(spark, "t_serve", "fpA", "k=3", "src:x") {
        builds += 1; corpus(7)
      }.as[(Long, String)].collect().toSet
    }
    val first = run()
    assert(builds === 1)
    val second = run()
    assert(builds === 1, "second call must serve, not rebuild")
    assert(second === first)
    assert(Files.exists(Paths.get(s"$root/t_serve")), "artifact dir")
    val Seq(leaf) = fpLeaves(s"$root/t_serve")
    assert(Files.exists(leaf.resolve("manifest.json")), "commit manifest")
    val payload = ArtifactStore.livePayload(leaf.toString)
    assert(payload.isDefined, "manifest must reference a live payload")
    assert(Files.exists(leaf.resolve(payload.get).resolve("_SUCCESS")),
      "payload marker")
    // exactly ONE payload dir: the committer vacuums its orphans
    assert(listNames(leaf.toString).count(_.startsWith("payload-")) === 1)
  }

  test("a changed fingerprint rebuilds AND vacuums the superseded " +
    "artifact (retention); a changed params string is a distinct " +
    "artifact") {
    val root = freshRoot()
    var builds = 0
    def run(fp: String, params: String, src: String = "src:x") = withRoot(root) {
      ArtifactStore.buildOrServe(spark, "t_vac", fp, params, src) {
        builds += 1; corpus(3)
      }.count()
    }
    run("fp1", "p")
    run("fp2", "p") // corpus changed → new address, old one vacuumed
    assert(builds === 2)
    val leaves = fpLeaves(s"$root/t_vac").map(_.getFileName.toString)
    assert(leaves === Seq("fp2"),
      s"superseded fingerprint must vacuum within its scope: $leaves")
    run("fp2", "q") // same corpus, different build params → new artifact
    assert(builds === 3)
    // a DIFFERENT LOGICAL SOURCE must coexist, not evict (the q257
    // `ne0` vs q335 `all` corpus variants share the artifact name)
    run("fp9", "p", src = "src:y")
    assert(builds === 4)
    val after = fpLeaves(s"$root/t_vac").map(_.getFileName.toString).sorted
    assert(after === Seq("fp2", "fp2", "fp9"),
      s"distinct (source, params) scopes must coexist: $after")
  }

  test("a torn build (manifest missing) is invisible and rebuilds " +
    "idempotently") {
    val root = freshRoot()
    var builds = 0
    def run() = withRoot(root) {
      ArtifactStore.buildOrServe(spark, "t_torn", "fpT", "p", "src:x") {
        builds += 1; corpus(4)
      }.count()
    }
    run()
    assert(builds === 1)
    // simulate a crash between payload write and manifest commit
    val Seq(leaf) = fpLeaves(s"$root/t_torn")
    Files.delete(leaf.resolve("manifest.json"))
    assert(run() === 4)
    assert(builds === 2, "a manifest-less payload must rebuild")
  }

  test("two threads racing the same artifact build it ONCE (the " +
    "per-directory lock) and both serve identical rows") {
    val root = freshRoot()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // both threads must see the conf — withRoot sets/unsets the shared
    // session conf, so set it around BOTH futures instead
    spark.conf.set(ArtifactStore.RootConf, root)
    try {
      val (a, b) = (Future(ArtifactStore.buildOrServe(spark, "t_race",
          "fpR", "p", "src:x") {
          builds.incrementAndGet(); Thread.sleep(200); corpus(6)
        }.count()),
        Future(ArtifactStore.buildOrServe(spark, "t_race",
          "fpR", "p", "src:x") {
          builds.incrementAndGet(); Thread.sleep(200); corpus(6)
        }.count()))
      assert(Await.result(a, 120.seconds) === 6L)
      assert(Await.result(b, 120.seconds) === 6L)
      assert(builds.get() === 1,
        s"racing threads built ${builds.get()} times, not once")
    } finally spark.conf.unset(ArtifactStore.RootConf)
  }

  test("fingerprint is order-independent, duplicate-sensitive, and " +
    "memoized per key") {
    ArtifactStore.clearFingerprintMemo()
    val a = corpus(20)
    val b = corpus(20).orderBy(col("id").desc) // same rows, new order
    val fpA = ArtifactStore.fingerprint(a, "fs:a")
    val fpB = ArtifactStore.fingerprint(b, "fs:b")
    assert(fpA === fpB, "row order must not change the fingerprint")
    // a duplicated pair at a changed count must miss
    val dup = a.unionAll(corpus(2))
    assert(ArtifactStore.fingerprint(dup, "fs:dup") !== fpA)
    // the r13 advice hole: an XOR fingerprint self-cancels duplicate
    // pairs, so {A,A,B} and {C,C,B} collided at EQUAL counts and could
    // serve a stale artifact for a changed corpus — the sum
    // fingerprint must distinguish them
    val aab = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "body")
    val ccb = Seq((3L, "c"), (3L, "c"), (2L, "b")).toDF("id", "body")
    assert(ArtifactStore.fingerprint(aab, "fs:aab") !==
      ArtifactStore.fingerprint(ccb, "fs:ccb"),
      "a swapped duplicate pair must change the fingerprint")
    val changed = corpus(19).unionAll(Seq((20L, "DOCX")).toDF("id", "body"))
    assert(ArtifactStore.fingerprint(changed, "fs:chg") !== fpA,
      "content change must change the fingerprint")
    // memo: same KEY returns the cached fp without rescanning (the
    // frame is different but the key pins the physical source)
    assert(ArtifactStore.fingerprint(changed, "fs:a") === fpA,
      "memo key must win within a session")
  }

  test("write-time part fingerprints fold to the scan fingerprint — " +
    "the O(#parts) managed-store staleness path (r13 verdict #1) — " +
    "and a one-row change rebuilds") {
    ArtifactStore.clearFingerprintMemo()
    val scanned = ArtifactStore.fingerprint(corpus(30), "fs:parts:whole")
    val p1 = ArtifactStore.partFingerprint(corpus(30).where(col("id") <= 13))
    val p2 = ArtifactStore.partFingerprint(corpus(30).where(col("id") > 13))
    assert(ArtifactStore.combineParts(Seq(p1, p2)) === scanned,
      "part sums must combine to the full-scan fingerprint")
    // sidecar round-trip: the store's commit-time metadata alone
    // reproduces the fingerprint — no data scan
    val store = Files.createTempDirectory("graft-fp").toString
    ArtifactStore.writeFpPart(store, "vecs-bid=0", p1)
    ArtifactStore.writeFpPart(store, "vecs-bid=1", p2)
    assert(ArtifactStore.fingerprintFromParts(store) === scanned)
    // a one-row content change in one part → different address →
    // the artifact REBUILDS (overwrite-idempotent sidecar, the
    // replayed-batch shape)
    val p2b = ArtifactStore.partFingerprint(corpus(30).where(col("id") > 14))
    ArtifactStore.writeFpPart(store, "vecs-bid=1", p2b)
    assert(ArtifactStore.fingerprintFromParts(store) !== scanned,
      "a changed part must change the folded fingerprint")
    // the include filter scopes the fold (committed-only reads)
    assert(ArtifactStore.fingerprintFromParts(store, _ == "vecs-bid=0")
      === ArtifactStore.combineParts(Seq(p1)))
  }

  test("part-addressed artifact: a one-part corpus change rebuilds " +
    "ONE part (delta rebuild), result == inline union, superseded " +
    "part content vacuums, departed partIds vacuum on the next " +
    "committing serve") {
    val root = freshRoot()
    val built = scala.collection.mutable.ArrayBuffer.empty[String]
    def slice(pid: String, hi: Int): DataFrame =
      corpus(hi).withColumn("pid", lit(pid))
    // (partId → (fp, builder)) for a given "corpus state"
    def run(parts: Seq[(String, Int)]): Set[(Long, String, String)] =
      withRoot(root) {
        val fps = parts.map { case (pid, hi) =>
          pid -> ArtifactStore.combineParts(
            Seq(ArtifactStore.partFingerprint(slice(pid, hi))))
        }
        val byPid = parts.toMap
        ArtifactStore.buildOrServeParts(spark, "t_parts", fps, "p=1",
          "src:x") { pid => built += pid; slice(pid, byPid(pid)) }
          .as[(Long, String, String)].collect().toSet
      }
    // initial: both parts build once
    val first = run(Seq("a" -> 3, "b" -> 4))
    assert(built.sorted == Seq("a", "b"))
    assert(first === (corpus(3).withColumn("pid", lit("a"))
      .unionByName(corpus(4).withColumn("pid", lit("b")))
      .as[(Long, String, String)].collect().toSet))
    // unchanged corpus: pure serve, no builds
    assert(run(Seq("a" -> 3, "b" -> 4)) === first)
    assert(built.sorted == Seq("a", "b"), "re-serve must not rebuild")
    // part b grows one row: ONLY b rebuilds (the delta contract)
    val second = run(Seq("a" -> 3, "b" -> 5))
    assert(built.sorted == Seq("a", "b", "b"),
      s"a one-part change must rebuild one part: $built")
    assert(second === (corpus(3).withColumn("pid", lit("a"))
      .unionByName(corpus(5).withColumn("pid", lit("b")))
      .as[(Long, String, String)].collect().toSet))
    // retention within the part: b's superseded fp vacuumed
    val partsDir = listNames(s"$root/t_parts").map(scope =>
      s"$root/t_parts/$scope/parts").head
    listNames(partsDir).foreach { pd =>
      assert(listNames(s"$partsDir/$pd").count(!_.startsWith(".")) === 1,
        s"one live fingerprint per part, got ${listNames(s"$partsDir/$pd")}")
    }
    assert(listNames(partsDir).size === 2)
    // REMOVAL-ONLY part-set change: a departs, b unchanged — nothing
    // to commit, so the honest contract (doc-pinned) is that a
    // serve-only caller does NOT vacuum: it cannot distinguish "a
    // departed" from "my part map is stale and a fresher process
    // added a" — deleting on a stale map would vacuum live data
    val removalOnly = run(Seq("b" -> 5))
    assert(removalOnly === (corpus(5).withColumn("pid", lit("b"))
      .as[(Long, String, String)].collect().toSet),
      "the served rows must follow the caller's part set immediately")
    assert(built.sorted == Seq("a", "b", "b"),
      "a removal-only change must not build")
    assert(listNames(partsDir).size === 2,
      "a serve-only caller must NOT vacuum the departed part")
    // part a departs + c arrives: c builds, a's dir vacuums (the
    // committing call owns the departed-part vacuum)
    val third = run(Seq("b" -> 5, "c" -> 2))
    assert(built.sorted == Seq("a", "b", "b", "c"))
    assert(third === (corpus(5).withColumn("pid", lit("b"))
      .unionByName(corpus(2).withColumn("pid", lit("c")))
      .as[(Long, String, String)].collect().toSet))
    assert(listNames(partsDir).size === 2,
      "a departed partId must vacuum on the next committing serve")
  }

  test("sidecar protocol fails LOUDLY: an unsafe part id is rejected " +
    "at write time, a corrupt sidecar throws at read time — a " +
    "silently dropped part would fold a silently stale fingerprint") {
    val store = Files.createTempDirectory("graft-fp-loud").toString
    intercept[IllegalArgumentException] {
      ArtifactStore.writeFpPart(store, """bad"quote""", (BigInt(1), 1L))
    }
    ArtifactStore.writeFpPart(store, "bid=0", (BigInt(7), 2L))
    Files.write(java.nio.file.Paths.get(s"$store/_fp/bid=1.json"),
      "{truncated".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      ArtifactStore.readFpParts(store)
    }
    assert(e.getMessage.contains("unparseable"))
  }

  test("part-addressed lifecycle PROPERTY: under a seeded random " +
    "sequence of part maps, every serve equals the inline union, a " +
    "build runs only for a never-before-seen (partId, fp) address, " +
    "and the final committing state holds exactly its live parts") {
    val rnd = new scala.util.Random(1409)
    val root = freshRoot()
    val built = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val everCommitted = scala.collection.mutable.Set.empty[(String, Int)]
    def slice(pid: String, v: Int): DataFrame =
      corpus(v).withColumn("pid", lit(pid))
    var lastCommitted = Map.empty[String, Int]
    (1 to 12).foreach { _ =>
      // a random part map over a 4-letter alphabet: subset of parts,
      // each with a random small "corpus version"
      val state = Seq("a", "b", "c", "d")
        .filter(_ => rnd.nextBoolean()).map(p => p -> (rnd.nextInt(3) + 1))
      if (state.nonEmpty) {
        val fps = state.map { case (pid, v) =>
          pid -> ArtifactStore.combineParts(
            Seq(ArtifactStore.partFingerprint(slice(pid, v)))) }
        val byPid = state.toMap
        val served = withRoot(root) {
          ArtifactStore.buildOrServeParts(spark, "t_prop", fps, "p",
            "src:prop") { pid =>
            built += (pid -> byPid(pid)); slice(pid, byPid(pid))
          }.as[(Long, String, String)].collect().toSet
        }
        val want = state.map { case (pid, v) =>
          slice(pid, v).as[(Long, String, String)].collect().toSet }
          .reduce(_ ++ _)
        assert(served === want, s"serve must equal inline for $state")
        // builds this step == exactly the not-currently-live addresses
        val newBuilds = built.drop(built.length -
          state.count(s => !everCommitted(s)))
        assert(newBuilds.toSet ===
          state.filter(s => !everCommitted(s)).toSet,
          s"step must build exactly the missing addresses for $state")
        // note: an address can REBUILD after departing (its dir was
        // vacuumed) — so track "committed and still live", not "ever"
        if (state.exists(s => !everCommitted(s))) {
          // a commit happened: only current pids remain on disk
          lastCommitted = byPid
          everCommitted.clear()
          everCommitted ++= state
        } else {
          // serve-only: previously-live parts stay (no vacuum)
          everCommitted ++= state
        }
      }
    }
    // the last committing state's pids are exactly the dirs on disk
    val partsDir = listNames(s"$root/t_prop").map(scope =>
      s"$root/t_prop/$scope/parts").head
    assert(lastCommitted.nonEmpty)
    assert(listNames(partsDir).toSet ===
      lastCommitted.keySet.map(p =>
        s"part-${ArtifactStore.contentHash(p)}"),
      "disk must hold the last committing serve's part set " +
        "(plus nothing a later serve-only call touched)")
  }

  test("part-addressed artifact with no root: inline union, builder " +
    "invoked per part every call") {
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def run() = ArtifactStore.buildOrServeParts(spark, "t_parts_nr",
      Seq("a" -> "fpa", "b" -> "fpb"), "p", "src:x") { pid =>
      built.incrementAndGet()
      corpus(2).withColumn("pid", lit(pid))
    }.count()
    assert(run() === 4L && run() === 4L)
    assert(built.get() === 4, "no root: every call builds inline")
  }

  test("a corpus rewritten IN PLACE under the same path mid-session " +
    "rebuilds WITHOUT clearFingerprintMemo — the file-level change " +
    "signal busts the session memo (the long-lived-serve-JVM hole)") {
    val root = freshRoot()
    val src = Files.createTempDirectory("graft-src").toString + "/c"
    corpus(5).write.parquet(src)
    def serve(): Set[(Long, String)] = withRoot(root) {
      val df = spark.read.parquet(src)
      ArtifactStore.buildOrServe(spark, "t_inplace",
        ArtifactStore.fingerprint(df, s"$src#c"), "p", s"$src#c")(df)
        .as[(Long, String)].collect().toSet
    }
    assert(serve() === corpus(5).as[(Long, String)].collect().toSet)
    // rewrite the SAME path with different rows — no memo clear
    corpus(9).write.mode("overwrite").parquet(src)
    assert(serve() === corpus(9).as[(Long, String)].collect().toSet,
      "the session memo must not serve the pre-rewrite artifact")
    // and an unchanged source still memoizes: same signal, same key
    assert(serve() === corpus(9).as[(Long, String)].collect().toSet)
  }

  private def logLines(root: String): Seq[String] = {
    val d = Paths.get(s"$root/_serve_log")
    if (!Files.isDirectory(d)) Seq.empty
    else graft.ops.Fs.ls(d)
      .filter(_.getFileName.toString.endsWith(".jsonl"))
      .flatMap(p => new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator)
  }

  test("serve log retention: the log rotates at the size threshold, " +
    "stays ≤2 files forever, and seq continues gap-free across the " +
    "readable union") {
    val root = freshRoot()
    spark.conf.set(ArtifactStore.ServeLogMaxBytesConf, "512")
    try withRoot(root) {
      ArtifactStore.buildOrServe(spark, "t_logrot", "fp0", "p", "src:r") {
        corpus(3)
      }.count()
      (1 to 60).foreach { _ =>
        ArtifactStore.buildOrServe(spark, "t_logrot", "fp0", "p",
          "src:r")(corpus(3)).count()
      }
      val files = graft.ops.Fs.ls(Paths.get(s"$root/_serve_log"))
        .map(_.getFileName.toString).filter(_.endsWith(".jsonl"))
      assert(files.size === 2,
        s"61 events over a 512-byte threshold must have rotated " +
          s"into exactly 2 files (got $files)")
      files.foreach(f => assert(
        Files.size(Paths.get(s"$root/_serve_log/$f")) < 2048,
        "each log file must stay near the threshold"))
      // the readable union is the TAIL of a gap-free sequence: only
      // the oldest events aged out, nothing in the middle
      val seqs = logLines(root)
        .map(l => """"seq":(\d+)""".r.findFirstMatchIn(l).get
          .group(1).toLong).sorted
      assert(seqs.last === 61L, "seq must not reset on rotation")
      assert(seqs === (seqs.head to seqs.last),
        "the surviving events must be one contiguous range")
    } finally spark.conf.unset(ArtifactStore.ServeLogMaxBytesConf)
  }

  test("serve log conf gate: spark.graft.artifact.serveLog=false " +
    "disables the append entirely — resolutions stay pure reads") {
    val root = freshRoot()
    spark.conf.set(ArtifactStore.ServeLogConf, "false")
    try withRoot(root) {
      ArtifactStore.buildOrServe(spark, "t_loggate", "fp0", "p",
        "src:g")(corpus(3)).count()
      ArtifactStore.buildOrServe(spark, "t_loggate", "fp0", "p",
        "src:g")(corpus(3)).count()
      assert(!Files.exists(Paths.get(s"$root/_serve_log")),
        "a gated store must not create the log at all")
    } finally spark.conf.unset(ArtifactStore.ServeLogConf)
  }

  test("part-addressed resolutions log ONE aggregated event each " +
    "(never one per part); per-part builds still log individually") {
    val root = freshRoot()
    withRoot(root) {
      val parts = (1 to 8).map(i => s"p$i" -> s"fp$i")
      def serve() = ArtifactStore.buildOrServeParts(spark, "t_logparts",
        parts, "p", "src:lp") { pid =>
        corpus(2).withColumn("pid", lit(pid))
      }.count()
      serve() // first: 8 per-part builds + 1 aggregated build event
      val after1 = logLines(root)
      assert(after1.count(_.contains(""""parts":8""")) === 1,
        s"first resolution must log one aggregated event: $after1")
      assert(after1.count(l => l.contains("t_logparts#") &&
        l.contains(""""action":"build"""")) === 8,
        "each part's build is real work and logs individually")
      serve() // pure serve-hit: ONE event total, no per-part spam
      val delta = logLines(root).size - after1.size
      assert(delta === 1,
        s"a pure part-addressed serve-hit must append exactly one " +
          s"event, got $delta")
      val last = logLines(root)
        .maxBy(l => """"seq":(\d+)""".r.findFirstMatchIn(l).get
          .group(1).toLong)
      assert(last.contains(""""action":"serve"""") &&
        last.contains(""""parts":8""") && last.contains(""""built":0"""),
        s"the aggregated hit must carry parts/built counts: $last")
    }
  }

  test("write-time fingerprint schema guard (r16 verdict #3): NaN / -0.0 " +
    "float columns are bit-exact through the observe fast path, and a " +
    "non-exact schema transparently falls back to read-back hashing") {
    val root = freshRoot()
    // NaN payload + signed-zero floats and doubles: the observe path's
    // written-evaluation hash must equal both the read-back hash and
    // the one-shot full-scan fingerprint
    val nan = Seq(
      (1L, Float.NaN, Double.NaN),
      (2L, -0.0f, -0.0),
      (3L, java.lang.Float.intBitsToFloat(0x7fc00001),  // NaN payload
        java.lang.Double.longBitsToDouble(0x7ff8000000000001L)),
      (4L, 1.5f, -2.25)).toDF("id", "f", "d")
    assert(ArtifactStore.fingerprintBitExact(nan.schema))
    val obsFp = ArtifactStore.writeWithFingerprint(nan, s"$root/nan")
    val back = spark.read.parquet(s"$root/nan")
      .select(col("id"), col("f"), col("d"))
    assert(ArtifactStore.combineParts(Seq(obsFp)) ===
      ArtifactStore.combineParts(Seq(ArtifactStore.partFingerprint(back))),
      "observe fingerprint must equal the parquet read-back hash " +
        "for NaN/-0.0 payloads")
    // a MapType column is NOT parquet-bit-exact for this protocol:
    // the guard must route around the observe path (and the read-back
    // hash then refuses loudly — Spark cannot hash maps — rather than
    // committing a silently-never-matching sidecar)
    val mapDf = Seq((1L, Map("a" -> 1L))).toDF("id", "m")
    assert(!ArtifactStore.fingerprintBitExact(mapDf.schema))
    val e = intercept[Exception] {
      ArtifactStore.writeWithFingerprint(mapDf, s"$root/mapped")
    }
    assert(Files.exists(Paths.get(s"$root/mapped/_SUCCESS")),
      "the fallback must still have WRITTEN the data before hashing")
    // per-partition observe twin: same guard, same equality
    val parts = Seq((0, 10L, 1.5), (0, 11L, Double.NaN),
      (1, 12L, -0.0)).toDF("b", "v", "d")
    val fps = ArtifactStore.observedPartFingerprints(parts, "b",
      Seq(0, 1, 2), Seq("b", "v", "d")) { d =>
      d.write.mode("overwrite").partitionBy("b").parquet(s"$root/parts")
    }.get
    assert(fps.map(_._1) === Seq(0, 1),
      "a value with no rows must get no fingerprint")
    val all = ArtifactStore.combineParts(fps.map(_._2))
    val scan = spark.read.option("basePath", s"$root/parts")
      .parquet(s"$root/parts")
    val scanFp = ArtifactStore.partFingerprint(
      scan.select(col("b"), col("v"), col("d")))
    assert(all === ArtifactStore.combineParts(Seq(scanFp)),
      "folded observe part fingerprints must equal the full-scan hash")
  }
}
