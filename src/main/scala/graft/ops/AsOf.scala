package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join.
  *
  * The reference's form: `price WHERE block <= H ORDER BY block DESC
  * LIMIT 1` per lookup (/root/reference/src/be_db_backfill.erl:288-299,
  * be_db_oracle_price.erl:64-70).
  *
  * Spark-first realization: union the two sides with a marker column and
  * run ONE window pass per key computing the running "last right-side
  * value at or before this row". This is a single shuffle+sort on
  * (key, time) — linear in input — instead of a per-row correlated lookup
  * or an O(L×R) range join. At 100 TB both sides shuffle once on the key;
  * skewed keys are handled by AQE skew-join splitting since the window
  * partitions by key.
  */
object AsOf {

  /** For each row of `left`, attach the latest `right` row value whose
    * `timeCol` is <= the left row's `timeCol`, matching on `key`.
    *
    * @param valueCols right-side columns to carry (emitted as `asof_<c>`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // Harmonize schemas: marker 1 = left (probe), 0 = right (reference).
    val l = valueCols.foldLeft(left.withColumn("__side", lit(1)))(
      (d, c) => d.withColumn(s"__v_$c", lit(null).cast(right.schema(c).dataType)))
    val r0 = right.withColumn("__side", lit(0))
    val r = valueCols.foldLeft(r0)((d, c) => d.withColumn(s"__v_$c", col(c)))
      .select((key :+ timeCol).map(col) ++ Seq(col("__side")) ++
        valueCols.map(c => col(s"__v_$c")) ++
        leftCols.filterNot(c => key.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.select(r.columns.map(col): _*).unionByName(r.select(l.columns.map(col): _*))
    // At equal time the right row sorts first (__side asc) so it is
    // visible to the left row — matches the reference's `<=` semantics.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withVals = valueCols.foldLeft(unioned)((d, c) =>
      d.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w)))
    withVals.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
