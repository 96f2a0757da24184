package graft.queries

import graft.Tables
import graft.ops.VectorSearch.{cosine, sq8Approx, toDouble}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second similarity-search group: scalar-quantized (SQ8) ANN — the
  * remaining rung of the compression ladder between raw floats and
  * product quantization (q85/q89): 1 byte per DIMENSION (4× smaller
  * than float32, ~8× larger than PQ's 1 byte per SUBSPACE) with far
  * better per-vector fidelity than PQ, which is why int8 quantization
  * is the default first step in production vector stores.
  */
object VectorQueries2 {

  private val Dims = 64

  /** DuckDB fragments shared with VectorQueries (same fold order). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(list_zip($a, $b), x -> x[1] * x[2])), (p, q) -> p + q)"
  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  val defs: Seq[QDef] = Seq(

    // SQ8 scalar-quantized ANN: per-dimension [min, max] corpus ranges
    // (ONE aggregation pass — min/max are exact selections, no float
    // accumulation, so the trained ranges need no late-bound oracle),
    // 8-bit codes with midpoint dequantization ranked against the
    // query (the fused codegen kernel computes exactly what ranking
    // against stored int8 codes computes), 50-candidate shortlist,
    // exact cosine re-rank — the q85 two-stage shape. At 100 TB the
    // scanned corpus is 4× smaller than raw float32 embeddings with
    // near-exact ranking fidelity (measured here: recall@10 = 10/10 vs
    // exact, where PQ's 8-byte codes reach 8/10 — the
    // compression/fidelity dial these three queries span); both
    // ranking stages are no-shuffle TakeOrdered, and the stats row
    // rides along as a broadcast.
    QDef("q94_ann_sq8",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // checkpointed: feeds the stats agg, the scan, and the re-rank
        val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .localCheckpoint()
        val statCols =
          (1 to Dims).map(d => min(element_at(col("v"), d)).as(s"mn$d")) ++
            (1 to Dims).map(d => max(element_at(col("v"), d)).as(s"mx$d"))
        val stats = e.agg(statCols.head, statCols.tail: _*)
          .select(
            array((1 to Dims).map(d => col(s"mn$d")): _*).as("mn"),
            array((1 to Dims).map(d => col(s"mx$d")): _*).as("mx"))
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        val short = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(stats))
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(sq8Approx(col("v"), col("mn"), col("mx")),
              col("qv")), 6).as("approx_sim"))
          .orderBy(col("approx_sim").desc, col("vec_id").asc)
          .limit(50)
          .select(col("vec_id"))
        short.join(e, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      Some {
        val mnList = (1 to Dims).map(d => s"min(v[$d])").mkString("[", ", ", "]")
        val mxList = (1 to Dims).map(d => s"max(v[$d])").mkString("[", ", ", "]")
        // x[1]=v, x[2]=mn, x[3]=mx — the kernel's parenthesization
        val approx = "list_transform(list_zip(v, st.mn, st.mx), x -> " +
          "CASE WHEN x[3] = x[2] THEN x[2] ELSE " +
          "x[2] + ((least(greatest(floor(((x[1] - x[2]) * 255.0) / " +
          "(x[3] - x[2])), 0.0), 255.0) + 0.5) * " +
          "((x[3] - x[2]) / 255.0)) END)"
        s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
           |st AS (SELECT $mnList AS mn, $mxList AS mx FROM e),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |a AS (SELECT vec_id, $approx AS approx
           |      FROM e CROSS JOIN st WHERE vec_id <> 0),
           |s AS (SELECT vec_id, round(${cosSql("approx", "qv")}, 6)
           |        AS approx_sim FROM a, q),
           |short AS (SELECT vec_id FROM s
           |          ORDER BY approx_sim DESC, vec_id ASC LIMIT 50),
           |x AS (SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
           |      FROM e JOIN short USING (vec_id), q)
           |SELECT vec_id, sim,
           |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
           |FROM x ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
      })
  )
}
