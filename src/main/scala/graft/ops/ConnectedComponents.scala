package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the cluster-resolution step of a dedup pipeline: near-dup PAIRS say
  * "a is a duplicate of b"; deleting one doc per pair over-deletes
  * (a~b, b~c keeps only c) or under-deletes depending on pair order, so
  * the standard move is to close the pairs into components and keep one
  * canonical doc per component.
  *
  * Scale design: each iteration is one shuffle join (labels ⋈ edges) and
  * one min-aggregation, both keyed on node id — the textbook Pregel
  * round, which is how GraphX's own `ConnectedComponents` runs. The
  * iteration count is the component DIAMETER, and dedup-cluster
  * diameters are tiny (a family of near-identical docs is a dense
  * clique, diameter 1-2), so the loop converges in 2-3 rounds; the
  * driver only ever sees the single convergence COUNTER per round,
  * never row data. Each round is `localCheckpoint`ed to cut lineage —
  * without the cut, round k re-executes rounds 1..k-1 (and Catalyst
  * re-analysis goes quadratic). For dedup clusters plain propagation
  * wins on constant factors; if it has NOT converged within
  * `starFallbackAfter` rounds the component diameter is large (a chain,
  * not a clique) and [[run]] switches to [[runStarContraction]], whose
  * round count is O(log n) regardless of diameter.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges
    * @param starFallbackAfter if plain propagation has not converged in
    *        this many rounds the graph has a long-diameter component
    *        (not a dedup clique); switch to [[runStarContraction]],
    *        which converges in O(log n) rounds regardless of diameter
    * @return (node, component) — component = min node id reachable;
    *         only nodes that appear in `edges` (callers left-join to
    *         recover singletons, saving a full-corpus shuffle here)
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 25, starFallbackAfter: Int = 8,
          localThreshold: Long = 200000): DataFrame = {
    val both = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    // Adaptive: a Spark job carries ~100 ms of fixed overhead, and each
    // propagation/star round is several jobs — for the small edge sets
    // LSH mining typically leaves (dedup cliques collapse most mass),
    // a bounded driver-side union-find beats 10+ rounds of shuffles.
    // The gate is a bounded limit-collect of cap+1 rows, NOT a count:
    // a count followed by runLocal's collect would execute the edge
    // lineage (e.g. full LSH pair mining) twice on the very path the
    // gate exists to speed up. Under the cap the collected array IS
    // the input to union-find; over it, the limit short-circuits and
    // the distributed paths below run unchanged (they are the 100 TB
    // design — at scale the pair set exceeds any driver). Labels are
    // min-reachable-id in both paths, so results are identical
    // (spec-pinned).
    collectIfSmall(both, localThreshold) match {
      case Some(es) => return unionFind(es, both)
      case None =>
    }
    val sym = both.union(both.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    val bound = math.min(maxIter, starFallbackAfter)
    while (!converged && i < bound) {
      // neighbor labels flow along edges; a node's next label is the min
      // of its own and everything it heard. The node's PREVIOUS label
      // rides through the same aggregation (only the self row carries a
      // non-null `old`, so max(old) recovers it) — convergence detection
      // is then a scan of the checkpointed result, not an extra shuffle
      // join per round.
      val msgs = labels.join(sym, col("node") === col("src"))
        .select(col("dst").as("node"), col("component"),
          lit(null).cast("long").as("old"))
      val next = labels
        .select(col("node"), col("component"), col("component").as("old"))
        .union(msgs)
        .groupBy("node")
        .agg(min("component").as("component"), max("old").as("old"))
        .localCheckpoint()
      val changed = next.filter(col("component") =!= col("old"))
        .limit(1).count()
      labels = next.select(col("node"), col("component"))
      converged = changed == 0
      i += 1
    }
    if (converged) labels
    // already counted past the gate above — go straight to the
    // distributed star contraction, no second count/checkpoint
    else starContract(both, maxIter)
  }

  /** One bounded collect of at most cap+1 edges: Some(edges) when the
    * set fits under the cap (the array then feeds union-find directly —
    * no second execution of the edge lineage), None when the limit
    * overflows (the large path re-derives from the cheap projection;
    * CollectLimit short-circuits, so an over-cap probe is at most one
    * pass and usually far less).
    */
  private def collectIfSmall(both: DataFrame,
                             cap: Long): Option[Array[(Long, Long)]] = {
    val spark = both.sparkSession
    import spark.implicits._
    val n = math.min(cap, Int.MaxValue - 2L).toInt
    val head = both.limit(n + 1).as[(Long, Long)].collect()
    if (head.length <= n) Some(head) else None
  }

  /** Driver-side union-find for edge sets under the adaptive gate:
    * path-halving + union-by-min so every root is its component's
    * minimum id — the same labeling the distributed paths converge to.
    */
  private def unionFind(es: Array[(Long, Long)], ref: DataFrame): DataFrame = {
    val spark = ref.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
      }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { // union by MIN id: min stays the root
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keysIterator
      .map(n => (n, find(n))).toSeq
      .toDF("node", "component")
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * O(log n)-round algorithm for graphs whose components have long
    * chains, where per-round label propagation would need diameter
    * rounds. Each star operation is one groupBy-min plus one join, both
    * keyed on node id, and provably shrinks the graph toward a forest
    * of stars centered at each component's minimum; at the fixpoint
    * every edge is (node → component-min) directly.
    */
  def runStarContraction(edges: DataFrame, srcCol: String, dstCol: String,
                         maxIter: Int = 30,
                         localThreshold: Long = 200000): DataFrame = {
    // same adaptive gate as run(): star rounds are ~4 jobs each, and a
    // chain-shaped graph needs O(log n) of them — under the cap a
    // driver union-find is strictly faster with identical labels. The
    // gate collects once (never count-then-collect) and never
    // materializes the large path (a checkpoint here would store every
    // edge once more for the loop's whole lifetime).
    val both = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    collectIfSmall(both, localThreshold) match {
      case Some(es) => unionFind(es, both)
      case None => starContract(both, maxIter)
    }
  }

  /** Distributed star contraction over ("src","dst")-named edges —
    * shared by [[runStarContraction]] and [[run]]'s fallback (which has
    * already counted the edge set past the gate and must not count or
    * checkpoint it again).
    */
  private def starContract(both: DataFrame, maxIter: Int): DataFrame = {
    // large-star: every node u computes m = min(Γ(u) ∪ {u}) and rewires
    // its LARGER neighbors v > u to m
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min("b").as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      // no distinct here: duplicates cannot change smallStar's
      // groupBy-min, and the round ends in smallStar's distinct anyway —
      // dropping it saves one full exchange per round. Volume stays
      // bounded: within the round each edge appears at most twice (the
      // two orientations of sym).
      sym.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
    }
    // small-star: edges oriented child-is-larger; every node u rewires
    // its smaller neighborhood (and itself) to its minimum neighbor
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      val mins = or.groupBy("a").agg(min("b").as("m"))
      val rewired = or.join(mins, "a")
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
      rewired.union(mins.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    // O(1) driver state per round: (count, hash-XOR) edge-set signature
    // (XOR, not sum: order-free over the distinct edge set and immune
    // to ANSI-mode long-overflow)
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val nodes = both
      .select(col("src").as("node"))
      .union(both.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    var e = both
      .select(col("src").as("a"), col("dst").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var sig = signature(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // one materialization per round, NOT batched: each star op
      // references its input twice (the self-union), so an
      // unmaterialized second round re-executes the first 2-4× —
      // measured 6.5 s vs 4.2 s at sf0.1 (the PLANS.md self-join
      // re-execution trap). The checkpoint per round is the cheaper
      // side of that trade.
      e = smallStar(largeStar(e)).localCheckpoint()
      val next = signature(e)
      converged = next == sig
      sig = next
      i += 1
    }
    // fixpoint edges point child → component-min; minima (and isolated
    // self-loop-only nodes) label themselves
    nodes.join(e.select(col("a").as("node"), col("b").as("component")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
