package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * All vector math is Catalyst higher-order functions over doubles with
  * sequential left-fold accumulation, so results are bit-reproducible
  * across engines (the DuckDB oracle uses the same fold order).
  *
  * Scale paths: brute-force top-k is a scan + per-partition partial
  * top-k (TakeOrderedAndProject) — no shuffle of the corpus. The LSH
  * variant buckets by sign bits under deterministic hyperplanes so the
  * candidate set stays O(n/2^bits · bands); IVF probes only the
  * closest coarse cells. Both avoid the O(n²) pair blowup at 100 TB.
  */
object VectorSearch {

  /** Sequential-fold dot product of two double arrays. Runs as a
    * codegen'd kernel ([[graft.expressions.DotProductDbl]]) with the
    * same ascending multiply-add order as the HOF form
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` — bit-identical doubles,
    * ~100× less per-element overhead than the interpreted lambdas.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.DotProductDbl(
      org.apache.spark.sql.GraftExpr.expression(a),
      org.apache.spark.sql.GraftExpr.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cast an array<float> column to array<double> (done before any
    * arithmetic so both engines multiply exactly-converted doubles).
    */
  def toDouble(a: Column): Column = transform(a, v => v.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine similarity to one query vector. The query
    * vector is a scalar subquery result pushed into every row — a
    * broadcast, not a join.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Column, k: Int, excludeId: Option[Long] = None)
      : DataFrame = {
    val base = excludeId.fold(emb)(id => emb.filter(col(idCol) =!= id))
    base.select(col(idCol),
        round(cosine(toDouble(col(vecCol)), query), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col(idCol).asc)))
  }

  /** All pairs with cosine >= threshold. Exact (O(n²) scored pairs) —
    * the correctness baseline; use [[lshCandidates]] ahead of this at
    * corpus scale.
    */
  def nearDupExact(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val n = emb.select(col(idCol).as("id"),
      toDouble(col(vecCol)).as("v"), norm(toDouble(col(vecCol))).as("nrm"))
    n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .withColumn("sim",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        round(col("sim"), 6).as("sim"))
  }

  /** Deterministic pseudo-random hyperplane for plane p, materialized
    * ONCE at plan time as a literal array (the hyperplane is a constant —
    * recomputing an md5 per (plane, dim) per row, as the SQL oracle
    * spells it, would be pure waste on the executors). Component d is
    * (md5Hex8("p:d") % 2001 - 1000) / 1000 — bit-identical to the SQL
    * formula `(cast('0x'||substr(md5(p||':'||d),1,8) as bigint) % 2001
    * - 1000) / 1000.0`.
    */
  def planeVector(p: Int, dims: Int): Seq[Double] =
    Seq.tabulate(dims)(d =>
      (graft.functions.TextAnalysis.md5Hex8(s"$p:$d") % 2001 - 1000) / 1000.0)

  /** Sign bit of vector · hyperplane p (1 when positive): one zip_with
    * dot against the broadcast literal plane.
    */
  def signBit(vec: Column, p: Int, dims: Int): Column = {
    val proj = aggregate(
      zip_with(vec, typedLit(planeVector(p, dims)), (x, w) => x * w),
      lit(0.0), (acc, x) => acc + x)
    when(proj > 0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket keys: `bands` bands of `bitsPerBand` sign bits each.
    * Returns (id, band, key) rows — join on equal (band, key) for
    * candidates. `dims` is the (fixed) embedding dimensionality, needed
    * to materialize the literal plane matrix at plan time.
    */
  def lshCandidates(emb: DataFrame, idCol: String, vecCol: String,
                    bands: Int, bitsPerBand: Int, dims: Int): DataFrame = {
    val v = toDouble(col(vecCol))
    val bandCols = (0 until bands).map { b =>
      val key = (0 until bitsPerBand)
        .map(i => signBit(v, b * bitsPerBand + i, dims) * (1 << i))
        .reduce((x, y) => x + y)
      struct(lit(b).as("band"), key.as("key"))
    }
    emb.select(col(idCol).as("id"), explode(array(bandCols: _*)).as("e"))
      .select(col("id"), col("e.band"), col("e.key"))
  }
}
