package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.ops.TopK
import org.apache.spark.sql.functions._

/** Sixty-eighth pipeline group — corpus characterization and user
  * lifecycle:
  *
  *  - q353: characteristic terms per source by TF-IDF: tf from one
  *    (source, token) aggregate, doc-level df from one distinct
  *    aggregate, idf = ln((N+1)/(df+1)) quantized to micro-nats per
  *    TERM before the integer product (q108 rule), per-source top-10
  *    by the mergeable partial/final TopK — never a per-source
  *    vocabulary sort window. The "what is this source about" table
  *    every corpus card starts with.
  *  - q354: new-vs-returning daily actives: first-seen day per user
  *    (one aggregate), then each (user, day) active row splits into
  *    new (first day) or returning — the growth-accounting
  *    decomposition of q340's DAU.
  */
object PipelineQueries68 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val TopTerms = 10

  val defs: Seq[QDef] = Seq(

    QDef("q353_source_keywords",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .localCheckpoint() // tf + df share the explode
        val n = Tables.documents(s, dir).count()
        val tf = toks.groupBy("source", "tok")
          .agg(count(lit(1)).as("tf"))
        val df = toks.select(col("doc_id"), col("tok")).distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))
          .withColumn("idf_micro",
            floor(lit(1000000.0) * log(
              (lit(n) + lit(1.0)) / (col("df") + lit(1.0))))
              .cast("long"))
        val scored = tf.join(df, "tok")
          .select(col("source"), col("tok"), col("tf"),
            (col("tf") * col("idf_micro")).as("score_micro"))
        TopK.perGroup(scored, "source",
            struct((-col("score_micro")).as("ns"), col("tok"),
              col("tf"), col("score_micro")), TopTerms)
          .select(col("source"), (col("rank") + 1).as("rank"),
            col("key.tok").as("tok"), col("key.tf").as("tf"),
            col("key.score_micro").as("score_micro"))
      },
      Some(s"""WITH t AS (SELECT doc_id, source, unnest($toksSql) AS tok
              |  FROM documents),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
              |tf AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS tf
              |  FROM t GROUP BY 1, 2),
              |df AS (SELECT tok,
              |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              |  FROM t GROUP BY 1),
              |i AS (SELECT tok,
              |    CAST(floor(1000000.0 * ln((n.n + 1.0) / (df + 1.0)))
              |      AS BIGINT) AS idf_micro
              |  FROM df, n),
              |sc AS (SELECT tf.source, tf.tok, tf.tf,
              |    tf.tf * i.idf_micro AS score_micro
              |  FROM tf JOIN i USING (tok)),
              |r AS (SELECT source, tok, tf, score_micro,
              |    row_number() OVER (PARTITION BY source
              |      ORDER BY score_micro DESC, tok ASC) AS rank
              |  FROM sc)
              |SELECT source, CAST(rank AS BIGINT) AS rank, tok, tf,
              |  score_micro
              |FROM r WHERE rank <= $TopTerms""".stripMargin)),

    QDef("q354_new_vs_returning",
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
          .localCheckpoint() // first-seen + daily actives share it
        val firstSeen = ud.groupBy("user_id")
          .agg(min("day").as("first_day"))
        ud.join(firstSeen, "user_id")
          .groupBy("day")
          .agg(count(lit(1)).as("active_users"),
            sum((col("day") === col("first_day")).cast("long"))
              .as("new_users"))
          .select(col("day"), col("active_users"), col("new_users"),
            (col("active_users") - col("new_users"))
              .as("returning_users"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, ts::DATE AS day
             |  FROM events),
             |fs AS (SELECT user_id, min(day) AS first_day
             |  FROM ud GROUP BY 1)
             |SELECT ud.day,
             |  CAST(count(*) AS BIGINT) AS active_users,
             |  CAST(sum(CASE WHEN ud.day = fs.first_day THEN 1
             |    ELSE 0 END) AS BIGINT) AS new_users,
             |  CAST(count(*) - sum(CASE WHEN ud.day = fs.first_day
             |    THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
             |FROM ud JOIN fs USING (user_id)
             |GROUP BY 1""".stripMargin))
  )
}
