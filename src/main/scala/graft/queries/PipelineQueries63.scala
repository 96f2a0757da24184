package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.ops.VectorSearch._
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sixty-third pipeline group — mixture design, engagement, retrieval
  * scoring, and embedding-compression evaluation:
  *
  *  - q339: temperature-scaled source sampling weights (the
  *    multilingual-mixing classic: p_s ∝ mass_s^α flattens the head
  *    and lifts the tail as α ↓). m^α needs pow/exp — NOT portable
  *    across engines at the last ulp — so the weights are computed
  *    ONCE driver-side from the collected O(S) masses and embedded
  *    as integer literals in both engines (the q327/q330 rule);
  *    the oracle recomputes the masses themselves from SQL.
  *  - q340: DAU/MAU stickiness per day. The q275 WAU shape extended
  *    to the 30-day window: the deduped (user, day) frame fans out to
  *    ≤30 target days (bounded fanout of the SMALL frame, never raw
  *    events), one distinct-count per day.
  *  - q341: Dirichlet-smoothed query-likelihood retrieval (Zhai &
  *    Lafferty 2004), the LM alternative to q90's BM25: score =
  *    Σ_t ln((tf + μ·cf_t/|C|) / (len_d + μ)), μ=2000. Every ln term
  *    is quantized to micro-nats BEFORE the sum (q108 rule); the
  *    rational inside ln is evaluated in doubles with the SAME
  *    operation order in both engines. ALL docs score against every
  *    term (zero-tf terms still contribute), so the grid is docs × 4
  *    query terms with a left join for tf.
  *  - q342: Matryoshka prefix-dimension recall — how much of the
  *    full-dimension top-10 survives when cosine runs on only the
  *    first P dims (P ∈ 8/16/32/64): the evaluation behind
  *    shortening-friendly embeddings (Kusupati et al. 2022). Exact
  *    brute-force per P (the q28 shape, TakeOrdered — no corpus
  *    shuffle); P=64 is the identity row by construction.
  */
object PipelineQueries63 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  private val Alphas = Seq(300L, 500L, 700L, 1000L)
  private val Mu = 2000L
  private val QueryTerms = Seq("spark", "join", "window", "sort")
  private val Prefixes = Seq(8, 16, 32, 64)

  private object MixOracle {
    @volatile var sql: Option[String] = None
  }

  val defs: Seq[QDef] = Seq(

    QDef("q339_temperature_mix",
      (s, dir) => {
        val masses = Tables.documents(s, dir)
          .select(col("source"), size(TextAnalysis.tokens(col("text")))
            .cast("long").as("ntok"))
          .groupBy("source").agg(sum("ntok").as("raw_tokens"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
          .sortBy(_._1)
        // α-powers driver-side; floor to micro AFTER normalization so
        // the embedded literal is the one number both engines carry
        val rows = Alphas.flatMap { a =>
          val pw = masses.map { case (src, m) =>
            (src, math.pow(m.toDouble, a.toDouble / 1000.0))
          }
          val tot = pw.map(_._2).sum
          pw.map { case (src, w) =>
            (src, a, masses.find(_._1 == src).get._2,
              math.floor(w / tot * 1e6).toLong)
          }
        }
        MixOracle.sql = Some {
          val lits = rows.map { case (src, a, _, w) =>
            s"('$src', ${a}, ${w})"
          }.mkString(",\n    ")
          s"""WITH m AS (SELECT source,
             |    CAST(sum(len($toksSql)) AS BIGINT) AS raw_tokens
             |  FROM documents GROUP BY 1),
             |w(source, alpha_milli, weight_micro) AS (VALUES
             |    $lits)
             |SELECT w.source, CAST(alpha_milli AS BIGINT) AS alpha_milli,
             |  m.raw_tokens, CAST(weight_micro AS BIGINT) AS weight_micro
             |FROM w JOIN m USING (source)""".stripMargin
        }
        s.createDataFrame(
          s.sparkContext.parallelize(rows.map { case (src, a, m, w) =>
            Row(src, a, m, w)
          }, 1),
          StructType(Seq(
            StructField("source", StringType),
            StructField("alpha_milli", LongType),
            StructField("raw_tokens", LongType),
            StructField("weight_micro", LongType))))
      },
      None,
      Some(() => MixOracle.sql)),

    QDef("q340_dau_mau_stickiness",
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
          .localCheckpoint() // DAU + the 30-day fanout share it
        val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
        val mau = ud
          .select(col("user_id"),
            explode(sequence(col("day"), date_add(col("day"), 29)))
              .as("day"))
          .groupBy("day")
          .agg(count_distinct(col("user_id")).as("mau"))
        dau.join(mau, "day") // inner: only observed days report
          .select(col("day"), col("dau"), col("mau"),
            expr("dau * 1000L div mau").as("stickiness_milli"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day
             |  FROM events),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |  FROM ud GROUP BY 1),
             |f AS (SELECT user_id, unnest(generate_series(day,
             |    day + INTERVAL 29 DAY, INTERVAL 1 DAY))::DATE AS day
             |  FROM ud),
             |mau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
             |    AS mau FROM f GROUP BY 1)
             |SELECT dau.day, dau.dau, mau.mau,
             |  dau.dau * 1000 // mau.mau AS stickiness_milli
             |FROM dau JOIN mau USING (day)""".stripMargin)),

    QDef("q341_qlm_dirichlet",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            size(col("toks")).cast("long").as("len"))
          .localCheckpoint() // tf + lengths + corpus stats share it
        val tf = docs
          .select(col("doc_id"), explode(col("toks")).as("tok"))
          .filter(col("tok").isInCollection(QueryTerms))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val cl = docs.agg(sum("len").as("cl"))
        val cf = docs
          .select(explode(col("toks")).as("tok"))
          .filter(col("tok").isInCollection(QueryTerms))
          .groupBy("tok").agg(count(lit(1)).as("cf"))
        val terms = typedLit(QueryTerms)
        val grid = docs.select(col("doc_id"), col("len"),
            explode(terms).as("tok"))
          .join(broadcast(cf), Seq("tok"), "left")
          .join(tf, Seq("doc_id", "tok"), "left")
          .crossJoin(broadcast(cl))
          .select(col("doc_id"),
            floor(lit(1000000.0) * log(
              (coalesce(col("tf"), lit(0L)).cast("double") * col("cl") +
                lit(Mu.toDouble) * coalesce(col("cf"), lit(0L))
                  .cast("double")) /
                ((col("len") + lit(Mu)).cast("double") * col("cl"))))
              .cast("long").as("mnat"))
        grid.groupBy("doc_id").agg(sum("mnat").as("score_micro"))
          .orderBy(col("score_micro").desc, col("doc_id").asc)
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("score_micro").desc, col("doc_id").asc)))
      },
      Some(s"""WITH d AS (SELECT doc_id, $toksSql AS toks
              |  FROM documents),
              |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len
              |  FROM d),
              |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
              |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT)
              |    AS tf FROM t
              |  WHERE tok IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
              |  GROUP BY 1, 2),
              |cl AS (SELECT CAST(sum(len) AS BIGINT) AS cl FROM dl),
              |cf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cf FROM t
              |  WHERE tok IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
              |  GROUP BY 1),
              |q(tok) AS (VALUES ${QueryTerms.map(t => s"('$t')")
                .mkString(", ")}),
              |g AS (SELECT dl.doc_id,
              |    CAST(floor(1000000.0 * ln(
              |      (coalesce(tf.tf, 0)::DOUBLE * cl.cl +
              |        ${Mu}.0 * coalesce(cf.cf, 0)::DOUBLE) /
              |      ((dl.len + $Mu)::DOUBLE * cl.cl))) AS BIGINT)
              |      AS mnat
              |  FROM dl CROSS JOIN q
              |  LEFT JOIN cf USING (tok)
              |  LEFT JOIN tf ON tf.doc_id = dl.doc_id
              |    AND tf.tok = q.tok, cl),
              |sc AS (SELECT doc_id, CAST(sum(mnat) AS BIGINT)
              |    AS score_micro FROM g GROUP BY 1)
              |SELECT doc_id, score_micro,
              |  row_number() OVER (ORDER BY score_micro DESC,
              |    doc_id ASC) AS rank
              |FROM sc ORDER BY score_micro DESC, doc_id ASC
              |LIMIT 10""".stripMargin)),

    QDef("q342_matryoshka_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val e = emb.filter(col("vec_id") =!= 0)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .localCheckpoint() // one scan per prefix, shared base
        val q = broadcast(emb.filter(col("vec_id") === 0)
          .select(toDouble(col("embedding")).as("qv")))
        def top10(p: Int) = e.crossJoin(q)
          .select(col("vec_id"),
            round(cosine(slice(col("v"), 1, p), slice(col("qv"), 1, p)), 6)
              .as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .select(col("vec_id"))
        val full = top10(64).localCheckpoint()
        Prefixes.map { p =>
          top10(p).join(full, "vec_id")
            .agg(count(lit(1)).as("overlap10"))
            .select(lit(p.toLong).as("p_dims"), col("overlap10"))
        }.reduce(_.unionByName(_))
      },
      Some {
        val parts = Prefixes.map { p =>
          s"""t$p AS (SELECT vec_id FROM s
             |  ORDER BY round(${cosSql(s"list_slice(v, 1, $p)",
                s"list_slice(qv, 1, $p)")}, 6) DESC, vec_id ASC
             |  LIMIT 10)""".stripMargin
        }.mkString(",\n")
        val sel = Prefixes.map { p =>
          s"""SELECT CAST($p AS BIGINT) AS p_dims,
             |  CAST((SELECT count(*) FROM t$p a
             |    JOIN t64 b USING (vec_id))
             |    AS BIGINT) AS overlap10""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |s AS MATERIALIZED (SELECT vec_id, v, qv FROM e, q
           |  WHERE vec_id <> 0),
           |$parts
           |$sel""".stripMargin
      })
  )
}
