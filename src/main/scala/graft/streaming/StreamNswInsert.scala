package graft.streaming

import graft.ops.{NswIndex, TopK, VectorSearch}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType,
  StructField, StructType}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming NSW graph maintenance — the MAINTAIN leg of the artifact
  * lifecycle (build: [[graft.ops.NswIndex.knnGraph]] / serve: q358 /
  * maintain: this): new vectors are INSERTED into the standing graph
  * the way HNSW inserts (Malkov & Yashunin, TPAMI 2018) — beam-search
  * the existing graph for each arrival's neighbors, link symmetric
  * edges — instead of rebuilding the O(n) graph per batch.
  *
  * Per micro-batch, all bounded by the BATCH, never the corpus:
  *  - arrivals are guarded (null / wrong-dims dropped — the
  *    StreamIvfRefresh poison-row rule) and insert-ignore deduped
  *    against the stored node set;
  *  - INTRA-batch edges come from the salt-capped [[NswIndex
  *    .knnGraph]] over just the batch (a batch-sized build);
  *  - CROSS edges come from ONE [[NswIndex.beamSearchBatch]] over the
  *    standing graph with the whole batch as the query set (the q259
  *    serving shape: `rounds` joins for the whole batch), keeping each
  *    new node's top-`m` discovered neighbors, symmetrized;
  *  - the batch's vectors and edges land in PER-BATCH partitions
  *    (`vecs/bid=N/`, `edges/bid=N/`, overwrite mode), so a replayed
  *    or crash-resumed batch OVERWRITES ITSELF — idempotence by
  *    construction, no anti-join against the corpus-sized edge store;
  *    the commit point is the meta file, written last via atomic move.
  *
  * Honest caveat (inherent to every incremental graph index, HNSW
  * included): the result depends on ARRIVAL ORDER — early nodes were
  * linked against a smaller graph, so slicing-invariance (drain ==
  * batch) does NOT hold edge-for-edge and is not claimed. What the
  * spec pins instead: determinism for a fixed slicing, replay
  * idempotence, bounded per-node degree growth, and the contract that
  * matters — SEARCH RECALL over the incrementally maintained graph
  * matches the statically rebuilt graph's on the same corpus.
  */
object StreamNswInsert {

  val vecSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("v", ArrayType(DoubleType))))
  val edgeSchema: StructType = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType)))

  private def meta(dir: String) = Paths.get(s"$dir/meta.txt")

  /** Applied-through batch id (-1 = empty store). */
  def appliedBid(storeDir: String): Long =
    if (Files.exists(meta(storeDir)))
      new String(Files.readAllBytes(meta(storeDir)),
        StandardCharsets.UTF_8).trim.toLong
    else -1L

  private def writeMeta(storeDir: String, bid: Long): Unit = {
    Files.createDirectories(Paths.get(storeDir))
    val tmp = Paths.get(s"$storeDir/meta.txt.tmp")
    Files.write(tmp, bid.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, meta(storeDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Committed node/edge views: only partitions at or below the meta
    * watermark — a torn later batch is invisible (the BlockIngest
    * reader rule). */
  def nodes(spark: SparkSession, storeDir: String): DataFrame =
    readCommitted(spark, s"$storeDir/vecs", vecSchema, storeDir)

  def edges(spark: SparkSession, storeDir: String): DataFrame =
    readCommitted(spark, s"$storeDir/edges", edgeSchema, storeDir)

  private def readCommitted(spark: SparkSession, dir: String,
                            schema: StructType, storeDir: String)
      : DataFrame = {
    val applied = appliedBid(storeDir)
    if (applied < 0 || !Files.exists(Paths.get(dir)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    spark.read.option("basePath", dir).parquet(dir)
      .where(col("bid") <= applied) // torn later batches invisible
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Apply one batch: guard, dedup, link, commit. Exposed for the
    * spec's replay/recall experiments. */
  private[graft] def applyBatch(batch: DataFrame, bid: Long,
                                idCol: String, vecCol: String,
                                centroids: Array[Array[Double]],
                                probes: Int, m: Int, beamWidth: Int,
                                rounds: Int, storeDir: String,
                                gate: Boolean = true): Unit = {
    val spark = batch.sparkSession
    if (gate && bid <= appliedBid(storeDir)) return
    val dims = centroids(0).length
    val existing = nodes(spark, storeDir).localCheckpoint()
    val fresh = batch
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(idCol).cast("long").as("id"),
        VectorSearch.toDouble(col(vecCol)).as("v"))
      // intra-batch dedup; min (lexicographic array order) not first:
      // a duplicated id with diverging payloads must resolve
      // deterministically or the replayed batch writes different edges
      .groupBy("id").agg(min("v").as("v"))
      .join(existing.select("id"), Seq("id"), "left_anti")
      .localCheckpoint() // intra-build + cross-search + write share it
    if (fresh.isEmpty) { writeMeta(storeDir, bid); return }
    // intra-batch edges: the batch-sized salt-capped build
    val intra = NswIndex.knnGraph(fresh, "id", "v", centroids, probes,
      m, NswIndex.DefaultBlockCap)
    // cross edges: beam-search the STANDING graph with the batch as
    // the query set; keep each arrival's top-m discovered neighbors
    val cross =
      if (existing.isEmpty) intra.limit(0)
      else {
        val vecs = existing
          .withColumn("nrm", VectorSearch.norm(col("v")))
          .localCheckpoint()
        val queries = fresh
          .select(col("id").as("qid"), col("v").as("qv"))
          .withColumn("qn", VectorSearch.norm(col("qv")))
        val entries = queries.select(col("qid"))
          .crossJoin(broadcast(existing.agg(min("id").as("id"))))
        val beam = NswIndex.beamSearchBatch(vecs,
          edges(spark, storeDir), queries, entries, beamWidth, rounds)
        val topm = TopK.perGroup(beam, "qid",
            struct((-col("sim")).as("ns"), col("id").as("id")), m)
          .select(col("qid").cast("long").as("src"),
            col("key.id").as("dst"))
        topm.unionByName(
          topm.select(col("dst").as("src"), col("src").as("dst")))
      }
    val newEdges = intra.unionByName(cross).distinct()
    // per-batch partitions, overwrite mode: a replayed batch
    // overwrites ITSELF — idempotent with no corpus-sized anti-join
    fresh.select(col("id"), col("v"))
      .write.mode("overwrite").parquet(s"$storeDir/vecs/bid=$bid")
    newEdges.write.mode("overwrite")
      .parquet(s"$storeDir/edges/bid=$bid")
    writeMeta(storeDir, bid) // commit point, strictly last
  }

  /** Wire an (id, vector) stream into the maintained graph. */
  def run(stream: DataFrame, idCol: String, vecCol: String,
          centroids: Array[Array[Double]], probes: Int, m: Int,
          beamWidth: Int, rounds: Int, storeDir: String,
          trigger: Trigger): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val spark = batch.sparkSession
        val before = spark.sparkContext.getPersistentRDDs.keySet
        try applyBatch(batch, bid, idCol, vecCol, centroids, probes,
          m, beamWidth, rounds, storeDir)
        finally spark.sparkContext.getPersistentRDDs.iterator
          .filter { case (id, _) => !before.contains(id) }
          .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
      }
}
