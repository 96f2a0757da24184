package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level distributed running sum (the q72/q75 construction,
  * shared by every prefix-budget operator): rows are ordered by
  * (groupCols…, hCol, idCol), and the "sum of everything before me"
  * decomposes into an IN-BUCKET window (bucketCol must be monotone in
  * the sort key — high bits of the hash) plus O(#buckets) serial
  * offsets broadcast back. No group ever windows an unbounded
  * partition — the scale contract a naive per-group running-sum window
  * violates (one dominant group = one task).
  *
  * The input must already be materialized (localCheckpoint) by the
  * caller: the frame is referenced by both the window pass and the
  * offsets aggregation, and an unmaterialized input would re-execute
  * its lineage per reference (the PLANS.md self-join trap).
  */
object PrefixSum {

  def twoLevelPrev(t: DataFrame, groupCols: Seq[String], bucketCol: String,
                   idCol: String, nCol: String, hCol: String,
                   outCol: String = "prev_tokens"): DataFrame = {
    val grp = groupCols.map(col)
    val inBucket = Window
      .partitionBy(grp :+ col(bucketCol): _*)
      .orderBy(col(hCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetsW = (if (groupCols.isEmpty) Window.orderBy(bucketCol)
      else Window.partitionBy(grp: _*).orderBy(bucketCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy(grp :+ col(bucketCol): _*)
      .agg(sum(nCol).as("c"))
      .withColumn("off", coalesce(sum("c").over(offsetsW), lit(0L)))
      .select(grp :+ col(bucketCol) :+ col("off"): _*)
    t.withColumn("local_prev", coalesce(sum(nCol).over(inBucket), lit(0L)))
      .join(broadcast(offsets), groupCols :+ bucketCol)
      .withColumn(outCol, col("off") + col("local_prev"))
      .drop("local_prev", "off")
  }
}
