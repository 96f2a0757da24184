package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Persisted write-once artifacts for built indexes and trained models
  * — the build-vs-serve split that is the real operating model at
  * 100 TB (r12 verdict #1). The reference reached the same conclusion
  * for its inventory: recompute-per-read lost to maintain-once-
  * serve-many (migrations/1590689602-gateway_inventory.sql:64 drops
  * the recomputing matview for the trigger-maintained table).
  *
  * An artifact is one DataFrame (a kNN edge table, a tokenizer vocab,
  * an IVF centroid/entry map) addressed by
  * `(name, corpus fingerprint, build params)`:
  *
  *  - '''fingerprint''' is an order-independent content hash of the
  *    source frame (xor of per-row xxhash64 + row count — one
  *    column-pruned scan, memoized per JVM session per source key),
  *    so a changed corpus can NEVER serve a stale artifact: it hashes
  *    to a different address and the artifact rebuilds. This is the
  *    staleness story; there is no TTL to tune.
  *  - '''commit discipline''' is [[graft.streaming.BlockIngest]]'s:
  *    the parquet payload is written first, `manifest.json` is written
  *    via temp-file + ATOMIC_MOVE strictly LAST, and readers require
  *    the manifest — a torn build (crash mid-write) is invisible and
  *    rebuilds idempotently.
  *  - '''retention''': committing a new fingerprint vacuums the
  *    SIBLING fingerprints of the same artifact name (the superseded
  *    corpora), so a long-lived root holds one live artifact per
  *    (name, params), not an unbounded history.
  *
  * Activation is conf-gated (`spark.graft.artifact.root`): unset, every
  * caller builds inline — the historical shape, and what unit specs
  * pin by default. Verify/Bench set the root, so within one sweep the
  * first query touching an artifact pays the build ONCE and every
  * later query (and every later sweep over the same corpus) serves a
  * parquet scan — e.g. q259 builds the NSW graph that q358 then
  * serves, which is exactly the serve ≪ build row the bench exists to
  * show.
  *
  * Serving is a plain `spark.read.parquet`: predicate pushdown, column
  * pruning and broadcast decisions all apply to the artifact as to any
  * table, and nothing about the artifact path is driver-resident.
  */
object ArtifactStore {

  /** Artifact root directory; unset/empty → the store is disabled and
    * [[buildOrServe]] is identity on `build`. */
  val RootConf = "spark.graft.artifact.root"

  def root(spark: SparkSession): Option[String] =
    spark.conf.getOption(RootConf).map(_.trim).filter(_.nonEmpty)

  /** (memoKey → fingerprint) — one content scan per source per JVM
    * session. The memo key must name the PHYSICAL source (dir + table
    * + projection), never the logical role; two queries over the same
    * files share the scan, two corpora never collide.
    */
  private val fpMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Order-independent content fingerprint of `df`: xor of per-row
    * xxhash64 over all columns, plus the row count (xor alone is
    * blind to duplicate-pair insertion — the count breaks that).
    * One scan, column-pruned to what `df` selects; memoized on
    * `memoKey` for the session.
    */
  def fingerprint(df: DataFrame, memoKey: String): String =
    fpMemo.computeIfAbsent(memoKey, _ => {
      val r = df
        .agg(bit_xor(xxhash64(df.columns.map(col).toIndexedSeq: _*)).as("x"),
          count(lit(1)).as("n"))
        .head()
      val x = if (r.isNullAt(0)) 0L else r.getLong(0)
      f"$x%016x_${r.getLong(1)}"
    })

  /** Test hook: drop the session fingerprint memo (a spec that
    * rewrites its fixture in place must re-scan). */
  private[graft] def clearFingerprintMemo(): Unit = fpMemo.clear()

  /** Stable short hash of the build-params string (cap, k, probes, m,
    * seed...) — params changes address a different artifact. */
  private def paramsHash(params: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(params.getBytes(StandardCharsets.UTF_8))
    md.take(6).map(b => f"$b%02x").mkString
  }

  /** Per-directory build locks: two threads of one JVM racing the same
    * artifact must build once (cross-JVM races are resolved by the
    * atomic manifest move — last committer wins, both correct). */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Serve `name` for the corpus identified by `fp` + `params` from
    * the artifact root, building and committing it first if absent.
    * With no root configured, evaluates `build` inline (the
    * historical, spec-pinned shape). The served frame is a plain
    * parquet scan — no build stages appear in its plan.
    *
    * `sourceKey` names the LOGICAL source (the fingerprint memo key:
    * dir + table + projection) and scopes retention: a new fingerprint
    * vacuums only the superseded content of the SAME (name, source,
    * params) — two corpus variants of one index (q257's `ne0` vs
    * q335's `all`) are distinct logical artifacts and coexist.
    */
  def buildOrServe(spark: SparkSession, name: String, fp: String,
                   params: String, sourceKey: String)
                  (build: => DataFrame): DataFrame =
    root(spark) match {
      case None => build
      case Some(r) =>
        val scope = s"s${paramsHash(sourceKey)}_p${paramsHash(params)}"
        val scopeDir = s"$r/$name/$scope"
        val dir = s"$scopeDir/$fp"
        val data = s"$dir/data"
        val lock = locks.computeIfAbsent(dir, _ => new Object)
        lock.synchronized {
          if (!committed(dir)) {
            build.write.mode("overwrite").parquet(data)
            writeManifest(dir, name, fp, params)
            vacuumSiblings(scopeDir, keep = fp)
          }
        }
        spark.read.parquet(data)
    }

  /** (address → decoded model) — small driver-side models (a trained
    * merge list, a vocab) memoize in-JVM on top of the parquet
    * artifact, so serving costs zero scans after first touch. Keyed on
    * the full content address: a changed corpus or params misses. */
  private val modelMemo =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** [[buildOrServe]] for DRIVER-SIDE models: the model round-trips
    * the store as a tiny DataFrame (`enc`/`dec` must be inverses up to
    * row order — `dec` owns any ordering). With no root configured
    * this is identity on `build` — no fingerprint scan, no memo (the
    * historical inline shape, unchanged for unit specs). */
  def buildOrServeModel[T <: AnyRef](spark: SparkSession, name: String,
                                     fp: String, params: String,
                                     sourceKey: String)
                                    (build: => T)
                                    (enc: T => DataFrame,
                                     dec: DataFrame => T): T =
    if (root(spark).isEmpty) build
    else modelMemo.computeIfAbsent(s"$name|$sourceKey|$params|$fp", _ =>
      dec(buildOrServe(spark, name, fp, params, sourceKey)(enc(build)))
    ).asInstanceOf[T]

  /** An artifact exists iff its manifest does AND the payload's
    * _SUCCESS marker survived (manifest is written last, so this is
    * belt-and-braces against a manually half-deleted dir). */
  private def committed(dir: String): Boolean =
    Files.exists(Paths.get(s"$dir/manifest.json")) &&
      Files.exists(Paths.get(s"$dir/data/_SUCCESS"))

  private def writeManifest(dir: String, name: String, fp: String,
                            params: String): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val body =
      s"""{"name":"${esc(name)}","fingerprint":"${esc(fp)}","params":"${esc(params)}"}"""
    val tmp = Paths.get(s"$dir/manifest.json.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(s"$dir/manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop superseded fingerprints of `name` after a successful commit
    * — the retention vacuum. Only ever touches the artifact root. */
  private def vacuumSiblings(nameDir: String, keep: String): Unit = {
    val d = Paths.get(nameDir)
    if (Files.isDirectory(d)) {
      children(d).foreach { p =>
        if (Files.isDirectory(p) && p.getFileName.toString != keep)
          deleteRecursively(p)
      }
    }
  }

  private def children(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try {
      val b = Seq.newBuilder[Path]
      s.iterator().forEachRemaining(c => b += c)
      b.result()
    } finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) children(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
