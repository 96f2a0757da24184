package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counts + local clustering coefficients over an
  * undirected edge list (both directions present, self-loops
  * excluded), via DEGREE-ORDERED orientation — the standard scalable
  * construction (each edge is charged to its lower-(degree, name)
  * endpoint, so wedge enumeration is bounded by oriented out-degree²
  * ≈ √m per node instead of hub-degree²; a neighbors×neighbors join
  * on a 10⁶-degree hub would otherwise emit 10¹² wedge rows).
  *
  * All joins are equi joins on domain names; the closing-edge check is
  * a semi join against the oriented edge set; the output is exact and
  * deterministic (integer milli clustering coefficients).
  */
object Triangles {

  /** (domain, deg, n_tri, cc_milli) — cc = 2·T/(deg·(deg−1)) in milli
    * units, 0 where deg < 2.
    */
  def perDomain(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.localCheckpoint() // deg + orientation share it
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
      .localCheckpoint() // orientation ×2 + final rollup
    val o = e.join(deg, "src")
      .join(deg.select(col("src").as("dst"), col("d").as("d2")), "dst")
      .filter(struct(col("d"), col("src")) <
        struct(col("d2"), col("dst")))
      .select(col("src").as("u"), col("dst").as("v"), col("d2").as("dv"))
      .localCheckpoint() // wedge sides + the closing probe
    val w = o.select(col("u"), col("v").as("b"), col("dv").as("db"))
      .join(o.select(col("u"), col("v").as("c"), col("dv").as("dc")), "u")
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
    val tri = w.join(o.select(col("u").as("b"), col("v").as("c")),
      Seq("b", "c"), "left_semi")
    val tc = tri
      .select(explode(array(col("u"), col("b"), col("c"))).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("t"))
    nodes
      .join(deg.withColumnRenamed("src", "domain"), Seq("domain"), "left")
      .join(tc, Seq("domain"), "left")
      .select(col("domain"),
        coalesce(col("d"), lit(0L)).as("deg"),
        coalesce(col("t"), lit(0L)).as("n_tri"))
      .withColumn("cc_milli", when(col("deg") >= 2,
        expr("(2000 * n_tri) div (deg * (deg - 1))"))
        .otherwise(lit(0L)))
  }
}
