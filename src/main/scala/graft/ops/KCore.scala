package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronized peeling.
  *
  * The k-core is the unique maximal subgraph in which every node has
  * degree ≥ k — uniqueness means ANY peel order converges to the same
  * subgraph, so the synchronized variant (drop ALL under-degree nodes
  * each round) is both the distributed-friendly schedule and a
  * deterministic, engine-replayable one: the DuckDB oracle replays
  * exactly `rounds` synchronized stages and lands on the same edge
  * set.
  *
  * Scale shape: each round is one degree aggregation (map-side
  * combined) and two semi joins keyed on the node id, with the edge
  * set checkpointed per round (the ConnectedComponents lineage
  * discipline — without the cut, round r re-plans r rounds of
  * lineage). Rounds are bounded by the graph's degeneracy ordering
  * depth — O(log n) on near-dup clique graphs, where each round
  * removes the full fringe. The CC `collectIfSmall` driver gate
  * pattern applies unchanged if sub-cap graphs dominate a workload;
  * the distributed loop here IS the 100 TB path.
  */
object KCore {

  /** Peel `edges` (undirected, one row per unordered pair) to the
    * k-core. Returns the surviving edge frame and the number of
    * synchronized rounds executed (the last round is the fixpoint
    * check that removes nothing).
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String,
            k: Int): (DataFrame, Int) = {
    var e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint()
    var n = e.count()
    var rounds = 0
    var changed = n > 0
    while (changed) {
      val keep = e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("node")
        .localCheckpoint() // read by BOTH semi joins — one aggregation
      val e2 = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
      val n2 = e2.count()
      // e2's checkpoint is materialized (eager + the count above), so
      // the PRIOR round's blocks are dead — free them now, or storage
      // grows linearly with peel rounds (one retained edge frame +
      // keep set per round) on exactly the long-peel graphs where the
      // distributed loop matters.
      keep.unpersist(blocking = false)
      e.unpersist(blocking = false)
      rounds += 1
      changed = n2 != n && n2 > 0
      e = e2
      n = n2
    }
    (e, rounds)
  }
}
