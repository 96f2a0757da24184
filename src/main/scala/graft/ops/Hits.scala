package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities over a DIRECTED (src, dst) edge list —
  * the companion to [[PageRank]] for citation-shaped domain graphs
  * (doc's own host links out to the hosts its text cites; PageRank's
  * co-citation graph is symmetric, which degenerates HITS to one
  * vector, so the directed graph is the one worth scoring).
  *
  * Same two physical shapes as [[PageRank]], gated on node
  * cardinality with the bounded `limit(n+1).count` probe:
  *
  *  - '''broadcast path''' (#nodes ≤ `spark.graft.hits
  *    .broadcastMaxNodes`, default 1e6): hub/authority vectors are
  *    O(#nodes) and broadcast into every half-iteration; the
  *    checkpointed edge table never shuffles.
  *  - '''shuffle path''': HITS joins edges by `src` in one
  *    half-iteration and by `dst` in the other, so this path lays the
  *    edge table out BOTH ways — `repartition(src)` and
  *    `repartition(dst)`, each checkpointed ONCE — and lets only the
  *    O(#nodes) vector shuffle per half-iteration (SHUFFLE_HASH-
  *    hinted). Two one-time edge shuffles buy zero per-iteration edge
  *    exchanges besides the map-side-combined contribution aggregates.
  *
  * Both paths run one integer recurrence, L1-normalized to micro
  * units each half-step:
  *   h0 = 1e6;  a = (Σ_in h · 1e6) div max(Σ_nodes Σ_in h, 1);
  *   h = (Σ_out a · 1e6) div max(Σ_nodes Σ_out a, 1)
  * so the gate changes the plan, never a micro-unit (HitsSpec pins
  * path equality). Overflow bound: raw sums reach 1e6·deg and the
  * normalization multiplies by 1e6, so per-node degree must stay
  * below ~9.2e6; past that, scale the raw sums down by 1e3 first
  * (documented, not needed at any tested scale).
  *
  * Reference shape: none — the reference engine has no graph
  * operator; this is part of the LLM-pipeline cleaning layer
  * (domain-authority signals for crawl curation).
  */
object Hits {

  val GateConf = "spark.graft.hits.broadcastMaxNodes"
  val DefaultGate = 1000000L

  /** (domain, indeg, outdeg, auth_micro, hub_micro) after `iters`
    * full hub+authority iterations.
    *
    * @param nodes distinct (domain) frame, O(#domains)
    * @param edges distinct directed (src, dst) frame — NOT yet
    *              checkpointed; each path materializes its own layout
    */
  def domainHits(nodes: DataFrame, edges: DataFrame, iters: Int)
  : DataFrame = {
    val spark = nodes.sparkSession
    val gate = spark.conf.getOption(GateConf).map(_.toLong)
      .getOrElse(DefaultGate)
    val n = math.min(gate, Int.MaxValue - 2L).toInt
    if (nodes.limit(n + 1).count() <= gate)
      run(nodes.localCheckpoint(), edges.localCheckpoint(), None, iters)
    else {
      val bySrc = edges.repartition(col("src")).localCheckpoint()
      val byDst = edges.repartition(col("dst")).localCheckpoint()
      run(nodes.repartition(col("domain")).localCheckpoint(),
        bySrc, Some(byDst), iters)
    }
  }

  /** One recurrence for both paths: `byDst == None` marks the
    * broadcast shape (vectors wrapped in `broadcast()`), `Some`
    * carries the dst-resident edge copy for the hub half-step.
    */
  private def run(nodes: DataFrame, bySrc: DataFrame,
                  byDst: Option[DataFrame], iters: Int): DataFrame = {
    def vec(df: DataFrame): DataFrame =
      if (byDst.isEmpty) broadcast(df) else df.hint("shuffle_hash")
    var hub = nodes.withColumn("h", lit(1000000L))
    var auth = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to iters) {
      val ar = bySrc // join key src: the src-resident copy stays put
        .join(vec(hub.withColumnRenamed("domain", "src")), "src")
        .groupBy(col("dst").as("domain")).agg(sum("h").as("ar"))
      auth = norm(nodes, ar, "ar", "a", byDst.isEmpty)
      val hr = byDst.getOrElse(bySrc) // join key dst: dst-resident copy
        .join(vec(auth.withColumnRenamed("domain", "dst")), "dst")
        .groupBy(col("src").as("domain")).agg(sum("a").as("hr"))
      hub = norm(nodes, hr, "hr", "h", byDst.isEmpty)
    }
    val outdeg = bySrc.groupBy(col("src").as("domain")) // co-located
      .agg(count(lit(1)).as("outdeg"))
    val indeg = byDst.getOrElse(bySrc).groupBy(col("dst").as("domain"))
      .agg(count(lit(1)).as("indeg")) // co-located on the dst copy
    nodes.join(vec(indeg), Seq("domain"), "left")
      .join(vec(outdeg), Seq("domain"), "left")
      .join(vec(auth), Seq("domain"), "left")
      .join(vec(hub), Seq("domain"), "left")
      .select(col("domain"), coalesce(col("indeg"), lit(0L)).as("indeg"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        col("a").as("auth_micro"), col("h").as("hub_micro"))
  }

  /** L1 micro-normalization: v = coalesce((raw·1e6) div max(Σraw,1), 0).
    * The Σ is a one-row aggregate broadcast back — never a second pass
    * over edges.
    */
  private def norm(nodes: DataFrame, raw: DataFrame, rawCol: String,
                   out: String, bcast: Boolean): DataFrame = {
    val tot = raw.agg(sum(rawCol).as("tot"))
    nodes.join(if (bcast) broadcast(raw) else raw.hint("shuffle_hash"),
        Seq("domain"), "left")
      .crossJoin(broadcast(tot))
      .select(col("domain"),
        coalesce(expr(s"($rawCol * 1000000) div greatest(tot, 1)"),
          lit(0L)).as(out))
  }
}
