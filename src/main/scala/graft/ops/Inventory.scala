package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-per-key ("inventory") semantics.
  *
  * The reference maintains `*_inventory` tables via AFTER-INSERT triggers
  * that upsert the newest row per key while preserving `first_block` and
  * applying per-column coalesce rules
  * (/root/reference/migrations/1590689602-gateway_inventory.sql:32-62,
  *  1610634227-gateway_inventory_reward_scale.sql:27).
  *
  * Spark-first realization: a single hash aggregation with `max_by` /
  * `min` — one shuffle on the key, map-side partial aggregation, no window
  * sort. This is the form that scales: at 100 TB an equivalent
  * `row_number() over (partition by key order by ver desc)` plan would
  * sort every partition; `max_by` keeps one running row per key per task.
  */
object Inventory {

  /** Collapse `df` to one row per `key`, taking each column in `latestCols`
    * from the row with the highest `ver`, plus `first_<ver>`/`last_<ver>`
    * and a row count. `ver` must be unique per key (the reference's block
    * height is; our fixtures use event_id) so the argmax is deterministic.
    *
    * Columns in `coalesceCols` take the value of the latest row where the
    * column is NON-NULL — the row-level effect of the trigger's
    * `x = coalesce(EXCLUDED.x, old.x)` upsert rule applied per insert in
    * `ver` order (ref: migrations/1610634227:27). `max_by` skips rows
    * whose ordering expression is null, so `max_by(c, ver when c not
    * null)` is exactly "last non-null".
    */
  def latestPerKey(df: DataFrame, key: Seq[String], ver: String,
                   latestCols: Seq[String],
                   coalesceCols: Set[String] = Set.empty,
                   touch: Option[(String, Column)] = None): DataFrame = {
    val aggs =
      latestCols.map { c =>
        val ord = if (coalesceCols(c))
          when(col(c).isNotNull, col(ver)) else col(ver)
        max_by(col(c), ord).as(s"last_$c")
      } ++
        Seq(min(col(ver)).as(s"first_$ver"),
            max(col(ver)).as(s"last_$ver"),
            count(lit(1)).as("n_rows"))
    val base = df.groupBy(key.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // every row of a fresh fold was just written — all get the touch
    touch.fold(base) { case (name, v) => base.withColumn(name, v) }
  }

  /** Incremental form: merge a new batch into an existing inventory state
    * produced by [[latestPerKey]]. Mirrors the trigger's upsert: keep the
    * old `first_<ver>`, take batch values when the batch is newer, and for
    * columns listed in `coalesceCols` keep the old value when the new one
    * is null (the reference's `reward_scale = coalesce(EXCLUDED, old)`
    * rule, migrations/1610634227:27).
    *
    * Implemented as a key-partitioned full-outer merge; with the state
    * table bucketed by key this is a co-partitioned join with no extra
    * shuffle of the (large) state side.
    */
  def mergeBatch(state: DataFrame, batch: DataFrame, key: Seq[String],
                 ver: String, latestCols: Seq[String],
                 coalesceCols: Set[String] = Set.empty,
                 touch: Option[(String, Column)] = None): DataFrame = {
    val b = latestPerKey(batch, key, ver, latestCols, coalesceCols)
    val joined = state.as("s").join(b.as("b"), key, "full_outer")
    val newer = col(s"b.last_$ver").isNotNull &&
      (col(s"s.last_$ver").isNull || col(s"b.last_$ver") > col(s"s.last_$ver"))
    def pick(c: String): Column = {
      val bv = col(s"b.last_$c")
      val sv = col(s"s.last_$c")
      val v = when(newer, if (coalesceCols(c)) coalesce(bv, sv) else bv)
        .otherwise(sv)
      v.as(s"last_$c")
    }
    val cols =
      key.map(col) ++ latestCols.map(pick) ++ Seq(
        least(col(s"s.first_$ver"), col(s"b.first_$ver")).as(s"first_$ver"),
        greatest(col(s"s.last_$ver"), col(s"b.last_$ver")).as(s"last_$ver"),
        (coalesce(col("s.n_rows"), lit(0L)) + coalesce(col("b.n_rows"), lit(0L)))
          .as("n_rows")) ++
        // updated_at touch (ref: migrations/1580305069:4-10): rows that
        // took batch data get the batch's touch value, untouched rows
        // keep their stored one — NOW() replaced by a deterministic
        // batch watermark so replays and oracles reproduce
        touch.map { case (name, v) =>
          when(newer, v).otherwise(col(s"s.$name")).as(name) }
    joined.select(cols: _*)
  }
}
