package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-authority PageRank over a pre-built (src, dst) edge list.
  *
  * Two physical shapes behind one arithmetic, gated on node
  * cardinality (the [[ConnectedComponents]] `collectIfSmall` pattern —
  * probe with a bounded `limit(n+1).count`, never an unbounded
  * collect):
  *
  *  - '''broadcast path''' (#nodes ≤ `spark.graft.pagerank.
  *    broadcastMaxNodes`, default 1e6): the rank vector, degree table
  *    and accumulator are all O(#nodes) and broadcast into each power
  *    iteration; the checkpointed edge table is never shuffled at all.
  *  - '''shuffle path''' (#nodes above the gate — the web-scale
  *    regime where 10⁷–10⁸ domains make a multi-GB broadcast per
  *    iteration a non-starter): the edge table is `repartition(src)`-ed
  *    and checkpointed ONCE; `localCheckpoint` preserves the hash
  *    partitioning, so every per-iteration rank/degree join reuses it
  *    and only the O(#nodes) side shuffles (SHUFFLE_HASH-hinted — a
  *    sort-merge would also sort the resident edge side each round).
  *    The one unavoidable per-iteration edge-mass exchange is the
  *    contribution aggregation by dst, and it combines map-side.
  *
  * Both paths run the same integer micro-unit recurrence
  * (r0 = 1e6, next = 150000 + (85 * Σ incoming r div deg) div 100),
  * so the gate changes the plan, never the answer — PageRankSpec pins
  * path equality, PlanContractSpec pins both shapes.
  *
  * Reference shape: domain-level quality priors (FineWeb-style);
  * the reference engine has no graph operator — this is part of the
  * LLM-pipeline layer.
  */
object PageRank {

  val GateConf = "spark.graft.pagerank.broadcastMaxNodes"
  val DefaultGate = 1000000L

  /** (domain, deg, r_micro) after `iters` power iterations.
    *
    * @param nodes distinct (domain) frame, O(#domains)
    * @param edges distinct (src, dst) frame — NOT yet checkpointed;
    *              each path materializes it in its own layout
    */
  def domainRanks(nodes: DataFrame, edges: DataFrame, iters: Int)
  : DataFrame = {
    val spark = nodes.sparkSession
    val gate = spark.conf.getOption(GateConf).map(_.toLong)
      .getOrElse(DefaultGate)
    if (nodesUnder(nodes, gate)) broadcastPath(nodes, edges, iters)
    else shufflePath(nodes, edges, iters)
  }

  /** Bounded cardinality probe: limit(gate+1) caps the job's output,
    * so an over-gate graph costs one capped pass, not a full count.
    */
  private def nodesUnder(nodes: DataFrame, gate: Long): Boolean = {
    val n = math.min(gate, Int.MaxValue - 2L).toInt
    nodes.limit(n + 1).count() <= gate
  }

  /** Small-domain-count shape: rank vector broadcast, edges resident. */
  private def broadcastPath(nodes: DataFrame, edges: DataFrame,
                            iters: Int): DataFrame = {
    val e = edges.localCheckpoint() // deg + every iteration read it
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val acc = e
        .join(broadcast(ranks.withColumnRenamed("domain", "src")), "src")
        .join(broadcast(deg), "src")
        .select(col("dst").as("domain"), expr("r div deg").as("c"))
        .groupBy("domain").agg(sum(col("c")).as("acc"))
      ranks = nodes.join(broadcast(acc), Seq("domain"), "left")
        .select(col("domain"), nextRank)
    }
    finish(ranks, broadcast(deg.withColumnRenamed("src", "domain")))
  }

  /** Web-scale shape: edges hash-resident by src, ranks shuffle. */
  private def shufflePath(nodes: DataFrame, edges: DataFrame,
                          iters: Int): DataFrame = {
    // ONE shuffle lays edges out by src; localCheckpoint pins the
    // partitioning so no later join exchanges this side again
    val e = edges.repartition(col("src")).localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")) // co-located
      .localCheckpoint()
    val n = nodes.repartition(col("domain")).localCheckpoint()
    var ranks = n.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val acc = e
        .join(ranks.withColumnRenamed("domain", "src")
          .hint("shuffle_hash"), "src")
        .join(deg.hint("shuffle_hash"), "src")
        .select(col("dst").as("domain"), expr("r div deg").as("c"))
        .groupBy("domain").agg(sum(col("c")).as("acc"))
      ranks = n.join(acc.hint("shuffle_hash"), Seq("domain"), "left")
        .select(col("domain"), nextRank)
    }
    finish(ranks,
      deg.withColumnRenamed("src", "domain").hint("shuffle_hash"))
  }

  /** Integer micro-unit damping: 0.15 teleport + 0.85 · inflow. */
  private val nextRank =
    (lit(150000L) + expr("(85 * coalesce(acc, 0L)) div 100")).as("r")

  private def finish(ranks: DataFrame, degByDomain: DataFrame)
  : DataFrame =
    ranks.join(degByDomain, Seq("domain"), "left")
      .select(col("domain"), coalesce(col("deg"), lit(0L)).as("deg"),
        col("r").as("r_micro"))
}
