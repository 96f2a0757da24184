package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed bounded top-k per group.
  *
  * The textbook formulation — `row_number() OVER (PARTITION BY group
  * ORDER BY …) <= k` — puts an entire group in one task (q9 keeps that
  * shape as the small-data baseline); a per-group `collect_list` +
  * sort caps nothing either. This operator is the partition-bounded
  * construction: a per-(group, input-partition) partial top-k (per-
  * TASK aggregation state never exceeds one partition's rows, and the
  * slice bounds stage 2's INPUT to k rows per (group, partition) —
  * the first groupBy still exchanges all rows; it is memory/skew, not
  * shuffle volume, that this shape fixes), then a final top-k over at
  * most #partitions · k rows per group. Correct under ANY
  * partitioning: the global top-k of a union is always contained in
  * the union of per-part top-ks, so the two-phase result is exactly
  * the one-phase answer — the same partial/final-aggregate shape
  * Spark's own `TakeOrdered` uses globally, applied per group.
  */
object TopK {

  /** Top-k rows per `groupCol`, ranked by the ASCENDING sort order of
    * `keyStruct` (pass e.g. `struct(-score, id)` for score-descending
    * with id tiebreak — the caller owns making the key total, i.e.
    * collision-free). Returns (groupCol, rank 0-based, key) where
    * `key` is the selected struct.
    */
  def perGroup(df: DataFrame, groupCol: String, keyStruct: Column,
               k: Int): DataFrame = {
    val partial = df
      .groupBy(col(groupCol), spark_partition_id().as("_pid"))
      .agg(slice(array_sort(collect_list(keyStruct)), 1, k).as("tk"))
    partial
      .select(col(groupCol), explode(col("tk")).as("s"))
      .groupBy(col(groupCol))
      .agg(slice(array_sort(collect_list(col("s"))), 1, k).as("tk"))
      .select(col(groupCol), posexplode(col("tk")).as(Seq("rank", "key")))
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Exact GLOBAL top-k (r12 verdict frontier (a)): per-partition
    * partial top-k with bounded state, then one EXECUTOR-SIDE merge
    * over ≤ #partitions · k partial rows. Spark's own
    * `orderBy(...).limit(k)` (TakeOrderedAndProject) computes the same
    * containment but funnels every partition's k candidates through
    * the DRIVER — at k = 10⁶ over 10⁴ partitions that is 10¹⁰ rows of
    * driver heap; here they meet in one reducer task and only the k
    * answer rows exist afterwards. Returns (rank 0-based, key).
    *
    * Correctness (the perGroup containment, group = the whole frame):
    * the global top-k of a union is contained in the union of
    * per-part top-ks, so phase 2 sees a superset of the answer and
    * selects exactly it. The caller owns making `keyStruct` a TOTAL
    * order (collision-free tiebreak): with duplicate keys, WHICH tied
    * rows survive would be partitioning-dependent — TopKSpec pins
    * both the equality-with-sort-limit law and the
    * partitioning-invariance law under a total key.
    */
  def global(df: DataFrame, keyStruct: Column, k: Int): DataFrame = {
    val partial = df
      .groupBy(spark_partition_id().as("_pid"))
      .agg(slice(array_sort(collect_list(keyStruct)), 1, k).as("tk"))
    partial
      .select(explode(col("tk")).as("s"))
      .agg(slice(array_sort(collect_list(col("s"))), 1, k).as("tk"))
      .select(posexplode(col("tk")).as(Seq("rank", "key")))
      .withColumn("rank", col("rank").cast("long"))
  }
}
