package graft.streaming

import graft.functions.TextAnalysis._
import graft.ops.{ConnectedComponents, Dedup}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming cluster-consistent train/val/test split — the arrival-time
  * twin of q258: a document's split is decided ONCE, at ingest, and
  * near-duplicates of an already-assigned document inherit its split,
  * so the leakage q258 closes in batch stays closed as the corpus
  * streams in (a batch re-split would reshuffle history — exactly what
  * a training pipeline cannot do once shards shipped).
  *
  * Per micro-batch (the StreamDecontaminate foreachBatch discipline —
  * the BATCH operators run verbatim, no second semantics to drift):
  *   1. intra-batch near-dup pairs (Dedup.nearDupMinhash) close into
  *      components (ConnectedComponents) → batch cluster reps;
  *   2. cross pairs against the assigned store
  *      (Dedup.nearDupMinhashCross — candidate volume scales with the
  *      BATCH, never the corpus) elect, per component, the minimum
  *      prior doc as anchor: the component inherits its split;
  *   3. unanchored components draw their split from the hash of their
  *      rep (the q258 rule); all members share the component's split;
  *   4. assignments append to the store insert-ignore (anti-join on
  *      doc_id), so a replayed batch changes nothing.
  *
  * Streaming caveat (documented, inherent): if two priors that are NOT
  * near-dups of each other landed in different splits and a later doc
  * near-dups BOTH (similarity is not transitive), one prior pair stays
  * straddled — history is immutable. Batch q258 sees the full closure
  * up front and cannot hit this; the spec's fixture pins the common
  * case (clusters arriving spread across batches) at zero straddle.
  * At 100 TB the store keeps (doc_id, signature, split) — text is
  * carried here only because the fixture re-derives signatures.
  */
object StreamSplit {

  val storeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("split", StringType)))

  /** One batch's assignment against the current store (pure batch
    * logic — shared by the stream wiring and any backfill). Returns
    * the NEW rows to append (already insert-ignore filtered). */
  def assignBatch(batch: DataFrame, prior: DataFrame,
                  threshold: Double = 0.8): DataFrame = {
    val b = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint() // pairs, components, and emission read it
    val newNew = Dedup.nearDupMinhash(b, "doc_id", "text",
      threshold = threshold).select(col("doc_a"), col("doc_b"))
    val comp = ConnectedComponents.run(newNew, "doc_a", "doc_b")
      .withColumnRenamed("node", "doc_id")
    val withRep = b.join(comp, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("component"), col("doc_id")))
    val inherit =
      Dedup.nearDupMinhashCross(b, prior, "doc_id", "text",
          threshold = threshold)
        .join(withRep.select(col("doc_id").as("doc_new"), col("rep")),
          "doc_new")
        .groupBy("rep").agg(min(col("doc_prior")).as("anchor"))
        .join(prior.select(col("doc_id").as("anchor"),
          col("split").as("isplit")), "anchor")
        .select(col("rep"), col("isplit"))
    withRep
      .join(broadcast(inherit), Seq("rep"), "left")
      .withColumn("hb", pmod(tokenHash(concat(lit("csplit:"),
        col("rep").cast("string"))), lit(100L)))
      .withColumn("split", coalesce(col("isplit"),
        when(col("hb") < 90, lit("train"))
          .when(col("hb") < 95, lit("val")).otherwise(lit("test"))))
      // insert-ignore: replayed docs are already in the store
      .join(prior.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("split"))
  }

  private def readStore(spark: SparkSession, dir: String): DataFrame =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
      spark.read.schema(storeSchema).parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[Row], storeSchema)

  /** Wire a (doc_id, text) stream into the split store at `storeDir`.
    * After each batch's append the leftover localCheckpoint blocks
    * (the batch frame, the store snapshot, and the signature tables
    * Dedup checkpoints internally) are freed — without this a
    * long-running follower accumulates one set of checkpoint RDDs per
    * micro-batch (the KCore round-leak class). Only blocks THIS batch
    * created are freed: the session may be shared with other streams
    * or user-cached frames, and unpersisting a foreign localCheckpoint
    * (lineage already truncated) makes that frame unrecoverable. */
  def run(stream: DataFrame, storeDir: String,
          trigger: Trigger, threshold: Double = 0.8): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val prior = readStore(spark, storeDir).localCheckpoint()
        try assignBatch(batch, prior, threshold)
          .write.mode("append").parquet(storeDir)
        finally spark.sparkContext.getPersistentRDDs.iterator
          .filter { case (id, _) => !before.contains(id) }
          .foreach { case (_, rdd) => rdd.unpersist(blocking = false) }
      }
}
