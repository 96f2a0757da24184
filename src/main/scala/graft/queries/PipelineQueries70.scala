package graft.queries

import graft.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Seventieth pipeline group — O(1) categorical sampling:
  *
  *  - q357: alias-method table (Vose 1991) over q352's unigram^0.75
  *    weights: V slots, each holding a keep-probability for its own
  *    token and an alias token for the overflow — two random draws
  *    sample in O(1) where q352's cumulative ranges need a binary
  *    search. Construction is inherently sequential (small/large
  *    worklists), so it runs DRIVER-side on the V-row weight table in
  *    EXACT integers (slot capacity = Σweights; no division anywhere),
  *    and the finished table embeds as oracle literals (q339 rule)
  *    while the token counts are SQL-verified. The defining
  *    reconstruction identity — every token's kept mass plus the
  *    overflow mass aliased to it equals weight·V exactly — is
  *    spec-pinned, as is an exhaustive simulated-draw check.
  */
object PipelineQueries70 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val NegV = 64

  private object AliasOracle {
    @volatile var sql: Option[String] = None
  }

  /** Integer Vose construction: weights w_i (any positive longs) over
    * V slots of capacity W = Σw. Returns (keep_i, alias_i) per index:
    * slot i fires its own token with probability keep_i/W (in slot-
    * local units where s_i = w_i·V is token i's total mass) and its
    * alias with (W − keep_i)/W. Exact: Σ_i [keep_i == own mass kept]
    * and every overflow assignment is integer bookkeeping — the
    * reconstruction identity holds with zero rounding.
    */
  def vose(w: Seq[Long]): Seq[(Long, Int)] = {
    val v = w.length
    val cap = w.sum
    val s = w.map(x => x * v).toArray // token masses in slot units
    val small = scala.collection.mutable.Queue(
      (0 until v).filter(i => s(i) < cap): _*)
    val large = scala.collection.mutable.Queue(
      (0 until v).filter(i => s(i) >= cap): _*)
    val rem = s.clone() // remaining unplaced mass per token
    val outKeep = new Array[Long](v)
    val outAlias = Array.tabulate(v)(identity)
    val filled = new Array[Boolean](v)
    while (small.nonEmpty && large.nonEmpty) {
      val sm = small.dequeue()
      val lg = large.front
      outKeep(sm) = rem(sm)
      outAlias(sm) = lg
      filled(sm) = true
      rem(lg) -= (cap - rem(sm))
      rem(sm) = 0
      if (rem(lg) < cap) { large.dequeue(); small.enqueue(lg) }
    }
    (small ++ large).foreach { i =>
      if (!filled(i)) { outKeep(i) = cap; outAlias(i) = i; filled(i) = true }
    }
    (0 until v).map(i => (outKeep(i), outAlias(i)))
  }

  val defs: Seq[QDef] = Seq(

    QDef("q357_alias_table",
      (s, dir) => {
        val top = Tables.documents(s, dir)
          .select(explode(graft.functions.TextAnalysis
            .tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc)
          .limit(NegV)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val pw = top.map { case (t, c) =>
          (t, c, math.pow(c.toDouble, 0.75))
        }
        val tot = pw.map(_._3).sum
        val weights = pw.map { case (t, c, x) =>
          (t, c, math.max(1L, math.floor(x / tot * 1e6).toLong))
        }
        val table = vose(weights.map(_._3).toSeq)
        val rows = weights.zip(table).map {
          case ((t, c, w), (keep, ai)) =>
            (t, c, w, keep, weights(ai)._1)
        }
        AliasOracle.sql = Some {
          val lits = rows.map { case (t, _, w, k, a) =>
            s"('${t.replace("'", "''")}', $w, $k, " +
              s"'${a.replace("'", "''")}')"
          }.mkString(", ")
          s"""WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
             |  FROM (SELECT unnest($toksSql) AS tok FROM documents)
             |  GROUP BY 1 ORDER BY cnt DESC, tok ASC LIMIT $NegV),
             |v(tok, weight_micro, keep_mass, alias_tok) AS
             |  (VALUES $lits)
             |SELECT v.tok, c.cnt,
             |  CAST(weight_micro AS BIGINT) AS weight_micro,
             |  CAST(keep_mass AS BIGINT) AS keep_mass, alias_tok
             |FROM v JOIN c USING (tok)""".stripMargin
        }
        s.createDataFrame(
          s.sparkContext.parallelize(rows.toSeq.map {
            case (t, c, w, k, a) => Row(t, c, w, k, a)
          }, 1),
          StructType(Seq(StructField("tok", StringType),
            StructField("cnt", LongType),
            StructField("weight_micro", LongType),
            StructField("keep_mass", LongType),
            StructField("alias_tok", StringType))))
      },
      None,
      Some(() => AliasOracle.sql))
  )
}
