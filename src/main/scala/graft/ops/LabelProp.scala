package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) over an
  * undirected edge list — the community complement to
  * [[ConnectedComponents]] (connectivity), [[PageRank]] (authority)
  * and [[Hits]] (hub/authority): after k rounds, densely linked
  * domains converge on a shared label while bridges keep communities
  * apart.
  *
  * Determinism: the classic LPA breaks score ties randomly; here a
  * node's next label is the neighbor label minimizing the TOTAL-
  * ordered (−count, label) struct — highest frequency, then smallest
  * label — and rounds are synchronous, so the result is bit-identical
  * across engines and partitionings (no async update races).
  *
  * Same two physical shapes as [[PageRank]], gated on node
  * cardinality: label vectors broadcast under the gate; above it the
  * edge table is repartition(dst)-ed — the per-round join key — and
  * checkpointed ONCE and only
  * the O(#nodes) label frame shuffles per round (the per-round
  * neighbor-label aggregation exchanges map-side-combined partials —
  * the one unavoidable per-round exchange).
  */
object LabelProp {

  val GateConf = "spark.graft.labelprop.broadcastMaxNodes"
  val DefaultGate = 1000000L

  /** (domain, label) after `iters` synchronous rounds; isolated nodes
    * keep their own name as label. `edges` must contain BOTH
    * directions of each undirected edge (the q129 co-citation shape).
    */
  def communities(nodes: DataFrame, edges: DataFrame, iters: Int)
  : DataFrame = {
    val spark = nodes.sparkSession
    val gate = spark.conf.getOption(GateConf).map(_.toLong)
      .getOrElse(DefaultGate)
    val n = math.min(gate, Int.MaxValue - 2L).toInt
    val bcast = nodes.limit(n + 1).count() <= gate
    val e = // per-round join key is dst: that's the resident layout
      if (bcast) edges.localCheckpoint()
      else edges.repartition(col("dst")).localCheckpoint()
    val nn =
      if (bcast) nodes.localCheckpoint()
      else nodes.repartition(col("domain")).localCheckpoint()
    def vec(df: DataFrame): DataFrame =
      if (bcast) broadcast(df) else df.hint("shuffle_hash")
    var labels = nn.withColumn("label", col("domain"))
    for (_ <- 1 to iters) {
      val next = e
        .join(vec(labels.select(col("domain").as("dst"), col("label"))),
          "dst") // neighbor labels arrive over the dst end
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src").as("domain"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
          .as("m"))
        .select(col("domain"), col("m.l").as("label"))
      labels = nn.join(vec(next.withColumnRenamed("label", "nl")),
          Seq("domain"), "left")
        .select(col("domain"),
          coalesce(col("nl"), col("domain")).as("label"))
      // no per-round checkpoint: 3 rounds of lineage plan cheaply and
      // keep the iteration joins inspectable in the final plan (the
      // PageRank discipline; PlanContractSpec reads them)
    }
    labels
  }
}
