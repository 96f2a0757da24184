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
  * re-analysis goes quadratic). For graphs with long chains at massive
  * scale the alternating large-star/small-star algorithm (Kiveris et
  * al., "Connected Components in MapReduce", SoCC'14) converges in
  * O(log n) rounds; for dedup clusters plain propagation wins on
  * constant factors.
  */
object ConnectedComponents {

  /** @param edges two-column DataFrame of undirected edges
    * @return (node, component) — component = min node id reachable;
    *         only nodes that appear in `edges` (callers left-join to
    *         recover singletons, saving a full-corpus shuffle here)
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 25): DataFrame = {
    val both = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val sym = both.union(both.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
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
    labels
  }
}
