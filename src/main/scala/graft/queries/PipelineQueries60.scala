package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixtieth pipeline group — user segmentation and the third
  * optimizer-advisor member (after q320 cardinality and q325 skew):
  *
  *  - q332: RFM segmentation (recency / frequency / monetary), the
  *    warehouse-classic customer scoring. R and F live on small
  *    bounded domains (calendar days; event counts) so their quintile
  *    scores come from EXACT value histograms + cumulative windows
  *    (the q149 discipline). M is a continuous money-like sum, where
  *    an exact per-value histogram is the q256 anti-pattern — M
  *    scores therefore come from the q264 log-bucket sketch (e =
  *    bitlen, 4-bit sub-bucket): quintiles at sketch resolution,
  *    which is the documented, deterministic definition in both
  *    engines. Scores: ceil(5·cum/N), recency inverted (recent=5).
  *  - q333: broadcast-threshold advisor. For each dimension table:
  *    row count and a width estimate (string bytes + 8 per numeric
  *    column), and the join-strategy recommendation against the
  *    standard 10 MB autoBroadcast threshold — the advisor trilogy's
  *    size member. Estimates are exact integer sums from one scan per
  *    table.
  */
object PipelineQueries60 {

  private val vmSql = "CAST(floor(value * 1000000.0) AS BIGINT)"
  private val BroadcastBytes = 10L * 1024 * 1024

  val defs: Seq[QDef] = Seq(

    QDef("q332_rfm_segmentation",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(max("ts")).as("d1"))
        val users = ev.crossJoin(broadcast(bounds))
          .groupBy("user_id")
          .agg(max(datediff(col("d1"), to_date(col("ts"))))
            .cast("long").as("r"),
            count(lit(1)).as("f"),
            sum(floor(col("value") * lit(1000000.0)).cast("long"))
              .as("m"))
          .localCheckpoint() // three score joins share it
        val n = users.count()
        def quintileScores(vals: DataFrame, vCol: String,
                           out: String): DataFrame = {
          val h = vals.groupBy(vCol).agg(count(lit(1)).as("c"))
          val w = Window.orderBy(vCol)
            .rowsBetween(Window.unboundedPreceding, 0)
          h.withColumn("cum", sum("c").over(w))
            .select(col(vCol),
              expr(s"(5 * cum + ${n}L - 1) div ${n}L").as(out))
        }
        // M: log-bucket key (q264 arithmetic) — bounded bucket domain
        val mb = users.withColumn("e",
            expr("CASE WHEN m >= 1 THEN length(conv(" +
              "cast(m as string), 10, 2)) - 1 ELSE -1 END")
              .cast("long"))
          .withColumn("sb", expr("CASE WHEN m >= 1 THEN " +
            "shiftright(m, cast(greatest(e - 4, 0L) as int)) & 15 " +
            "ELSE 0L END"))
          .withColumn("mkey", col("e") * 16 + col("sb"))
        val rScores = quintileScores(users.select("r"), "r", "rq")
        val fScores = quintileScores(users.select("f"), "f", "fq")
        val mScores = quintileScores(mb.select("mkey"), "mkey", "mq")
        mb.join(broadcast(rScores), "r")
          .join(broadcast(fScores), "f")
          .join(broadcast(mScores), "mkey")
          .select(col("user_id"), col("r").as("recency_days"),
            col("f").as("n_events"), col("m").as("monetary_micro"),
            (lit(6L) - col("rq")).as("r_score"),
            col("fq").as("f_score"), col("mq").as("m_score"),
            ((lit(6L) - col("rq")) * 100 + col("fq") * 10 + col("mq"))
              .as("rfm"))
      },
      Some(s"""WITH b AS (SELECT max(ts::DATE) AS d1 FROM events),
              |u AS MATERIALIZED (SELECT user_id,
              |    CAST(max(date_diff('day', ts::DATE, b.d1))
              |      AS BIGINT) AS r,
              |    CAST(count(*) AS BIGINT) AS f,
              |    CAST(sum($vmSql) AS BIGINT) AS m
              |  FROM events, b GROUP BY 1),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
              |rh AS (SELECT r, CAST(count(*) AS BIGINT) AS c
              |  FROM u GROUP BY 1),
              |rq AS (SELECT r, (5 * CAST(sum(c) OVER (ORDER BY r)
              |    AS BIGINT) + n.n - 1) // n.n AS rq FROM rh, n),
              |fh AS (SELECT f, CAST(count(*) AS BIGINT) AS c
              |  FROM u GROUP BY 1),
              |fq AS (SELECT f, (5 * CAST(sum(c) OVER (ORDER BY f)
              |    AS BIGINT) + n.n - 1) // n.n AS fq FROM fh, n),
              |mk AS (SELECT user_id, r, f, m,
              |    (CASE WHEN m >= 1 THEN length(bin(m)) - 1
              |      ELSE -1 END) * 16 +
              |    (CASE WHEN m >= 1 THEN (m >> greatest(
              |      length(bin(m)) - 1 - 4, 0)) & 15 ELSE 0 END)
              |      AS mkey
              |  FROM u),
              |mh AS (SELECT mkey, CAST(count(*) AS BIGINT) AS c
              |  FROM mk GROUP BY 1),
              |mq AS (SELECT mkey, (5 * CAST(sum(c) OVER
              |    (ORDER BY mkey) AS BIGINT) + n.n - 1) // n.n AS mq
              |  FROM mh, n)
              |SELECT mk.user_id, mk.r AS recency_days,
              |  mk.f AS n_events, mk.m AS monetary_micro,
              |  6 - rq.rq AS r_score, fq.fq AS f_score,
              |  mq.mq AS m_score,
              |  (6 - rq.rq) * 100 + fq.fq * 10 + mq.mq AS rfm
              |FROM mk JOIN rq ON mk.r = rq.r
              |  JOIN fq ON mk.f = fq.f
              |  JOIN mq ON mk.mkey = mq.mkey""".stripMargin)),

    QDef("q333_broadcast_advisor",
      (s, dir) => {
        def tbl(name: String, df: DataFrame,
                strCols: Seq[String], numCols: Int) = {
          // octet_length, not length: the 10 MB broadcast threshold is
          // a BYTE budget, and character counts undercount UTF-8
          // multi-byte data (DuckDB twin: strlen = UTF-8 bytes)
          val strBytes = strCols.map(c => sum(expr(s"octet_length($c)")))
            .reduceOption(_ + _).getOrElse(lit(0L)).cast("long")
          df.agg(count(lit(1)).as("n_rows"),
            (strBytes + count(lit(1)) * (numCols * 8L))
              .as("est_bytes"))
            .select(lit(name).as("table_name"), col("n_rows"),
              col("est_bytes"),
              when(col("est_bytes") <= BroadcastBytes,
                lit("broadcast")).otherwise(lit("shuffle"))
                .as("strategy"))
        }
        tbl("region", Tables.region(s, dir), Seq("r_name"), 1)
          .unionByName(tbl("nation", Tables.nation(s, dir),
            Seq("n_name"), 2))
          .unionByName(tbl("supplier", Tables.supplier(s, dir),
            Seq("s_name"), 3))
          .unionByName(tbl("part", Tables.part(s, dir),
            Seq("p_name", "p_brand", "p_type"), 3))
          .unionByName(tbl("customer", Tables.customer(s, dir),
            Seq("c_name", "c_mktsegment"), 3))
          .unionByName(tbl("orders", Tables.orders(s, dir),
            Seq("o_orderstatus", "o_orderpriority"), 4))
      },
      Some {
        def one(name: String, strCols: Seq[String], num: Int) = {
          val sb =
            if (strCols.isEmpty) "0"
            else strCols.map(c => s"sum(strlen($c))").mkString(" + ")
          s"""SELECT '$name' AS table_name,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST($sb + count(*) * ${num * 8} AS BIGINT)
             |    AS est_bytes,
             |  CASE WHEN CAST($sb + count(*) * ${num * 8} AS BIGINT)
             |    <= $BroadcastBytes THEN 'broadcast'
             |    ELSE 'shuffle' END AS strategy
             |FROM $name""".stripMargin
        }
        Some(Seq(
          one("region", Seq("r_name"), 1),
          one("nation", Seq("n_name"), 2),
          one("supplier", Seq("s_name"), 3),
          one("part", Seq("p_name", "p_brand", "p_type"), 3),
          one("customer", Seq("c_name", "c_mktsegment"), 3),
          one("orders", Seq("o_orderstatus", "o_orderpriority"), 4))
          .mkString("\nUNION ALL\n"))
      }.get)
  )
}
