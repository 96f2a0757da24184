package graft.queries

import graft.Tables
import graft.ops.{ConnectedComponents, Dedup, Sketches}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sixty-seventh pipeline group — split hygiene and sampling tables:
  *
  *  - q351: cross-validation fold leakage audit. Folding by raw
  *    doc-id hash puts the two halves of a near-duplicate pair into
  *    different folds (train/eval leakage — the q228 problem at fold
  *    granularity); folding by the near-dup CLUSTER canonical (q258's
  *    cluster-closed rule, generalized from one split to K folds)
  *    leaks ZERO pairs by construction. The audit measures both
  *    schemes on q25's verified pair set: pairs from the
  *    blocked/salted LSH path, clusters from star contraction, folds
  *    from the portable hash — at 100 TB the only addition over q25
  *    is two map-side hash columns and an O(pairs) count.
  *  - q352: negative-sampling table (unigram^0.75, the word2vec
  *    smoothing): top-V tokens with cumulative micro ranges for
  *    inverse-CDF sampling. count^0.75 is pow — driver-computed from
  *    the collected top-V counts and embedded as literals (q339
  *    rule); the counts themselves are SQL-verified.
  */
object PipelineQueries67 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "CAST('0x' || substr(md5(__T__), 1, 8) AS BIGINT)"
  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  private val Folds = 5L
  private val NegV = 64

  private object NegOracle {
    @volatile var sql: Option[String] = None
  }

  val defs: Seq[QDef] = Seq(

    QDef("q351_fold_leakage",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.nearDupMinhashArtifact(docs, "doc_id", "text",
          fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"))
          .localCheckpoint() // CC + both leakage counts read it
        val canon = ConnectedComponents
          .runStarContraction(pairs, "doc_a", "doc_b")
          .withColumnRenamed("node", "doc_id")
        val folds = docs.select(col("doc_id"))
          .join(canon, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("canon"))
          .select(col("doc_id"),
            pmod(Sketches.hash60(concat(lit("fold:"),
              col("doc_id").cast("string"))), lit(Folds)).as("naive"),
            pmod(Sketches.hash60(concat(lit("fold:"),
              col("canon").cast("string"))), lit(Folds)).as("closed"))
          .localCheckpoint() // joined twice below
        def leaked(scheme: String, c: String) = pairs
          .join(folds.select(col("doc_id").as("doc_a"),
            col(c).as("fa")), "doc_a")
          .join(folds.select(col("doc_id").as("doc_b"),
            col(c).as("fb")), "doc_b")
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("fa") =!= col("fb")).cast("long")).as("leaked"))
          .select(lit(scheme).as("scheme"), col("n_pairs"),
            col("leaked"),
            expr("leaked * 1000L div greatest(1L, n_pairs)")
              .as("leaked_milli"))
        leaked("naive", "naive").unionByName(leaked("closed", "closed"))
      },
      Some(s"""WITH RECURSIVE t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |sh AS (
              |  SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")})) AS sh
              |  FROM t),
              |pr AS MATERIALIZED (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh) -
              |        len(list_intersect(a.sh, b.sh))) >= 0.8),
              |e AS (SELECT doc_a AS a, doc_b AS b FROM pr
              |      UNION SELECT doc_b, doc_a FROM pr),
              |reach(a, b) AS (
              |  SELECT a, b FROM e
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
              |cl AS (SELECT a AS doc_id, min(b) AS mn FROM reach
              |  GROUP BY a),
              |f AS MATERIALIZED (SELECT d.doc_id,
              |    ${hash60Sql("'fold:' || CAST(d.doc_id AS VARCHAR)")}
              |      % $Folds AS naive,
              |    ${hash60Sql(
                 "'fold:' || CAST(least(d.doc_id, " +
                   "coalesce(cl.mn, d.doc_id)) AS VARCHAR)")}
              |      % $Folds AS closed
              |  FROM documents d LEFT JOIN cl USING (doc_id)),
              |lk AS (SELECT
              |    CAST(count(*) AS BIGINT) AS n_pairs,
              |    CAST(sum(CASE WHEN fa.naive <> fb.naive THEN 1
              |      ELSE 0 END) AS BIGINT) AS ln,
              |    CAST(sum(CASE WHEN fa.closed <> fb.closed THEN 1
              |      ELSE 0 END) AS BIGINT) AS lc
              |  FROM pr JOIN f fa ON fa.doc_id = pr.doc_a
              |    JOIN f fb ON fb.doc_id = pr.doc_b)
              |SELECT 'naive' AS scheme, n_pairs, ln AS leaked,
              |  ln * 1000 // greatest(1, n_pairs) AS leaked_milli
              |FROM lk
              |UNION ALL
              |SELECT 'closed', n_pairs, lc,
              |  lc * 1000 // greatest(1, n_pairs) FROM lk""".stripMargin)),

    QDef("q352_negative_sampling",
      (s, dir) => {
        val top = Tables.documents(s, dir)
          .select(explode(graft.functions.TextAnalysis
            .tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc)
          .limit(NegV)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        val w = top.map { case (t, c) =>
          (t, c, math.pow(c.toDouble, 0.75))
        }
        val tot = w.map(_._3).sum
        var cum = 0L
        val rows = w.map { case (t, c, x) =>
          val wm = math.floor(x / tot * 1e6).toLong
          cum += wm
          (t, c, wm, cum)
        }
        NegOracle.sql = Some {
          val lits = rows.map { case (t, _, wm, ch) =>
            s"('${t.replace("'", "''")}', $wm, $ch)"
          }.mkString(", ")
          s"""WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
             |  FROM (SELECT unnest($toksSql) AS tok FROM documents)
             |  GROUP BY 1 ORDER BY cnt DESC, tok ASC LIMIT $NegV),
             |v(tok, weight_micro, cum_hi_micro) AS (VALUES $lits)
             |SELECT v.tok, c.cnt,
             |  CAST(weight_micro AS BIGINT) AS weight_micro,
             |  CAST(cum_hi_micro AS BIGINT) AS cum_hi_micro
             |FROM v JOIN c USING (tok)""".stripMargin
        }
        s.createDataFrame(
          s.sparkContext.parallelize(rows.toSeq.map {
            case (t, c, wm, ch) => Row(t, c, wm, ch)
          }, 1),
          StructType(Seq(StructField("tok", StringType),
            StructField("cnt", LongType),
            StructField("weight_micro", LongType),
            StructField("cum_hi_micro", LongType))))
      },
      None,
      Some(() => NegOracle.sql))
  )
}
