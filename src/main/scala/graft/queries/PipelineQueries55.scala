package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fifty-fifth pipeline group — shuffle-skew planning and multi-scale
  * signal energy:
  *
  *  - q325: join-key skew diagnosis + salting plan. Before any big
  *    join ships, the question is "does one key overwhelm one task?";
  *    the advisor computes, per join-key column, the heavy-hitter
  *    factor (max key count ÷ mean key count, milli) and the salt
  *    factor AQE-style remediation would need: how many ways the
  *    hottest key must split so no task exceeds the even-partition
  *    target (n div 32 — the session's shuffle width). One
  *    aggregation per key column, O(#keys) output. This is the
  *    planning number behind every `repartition`/salting decision in
  *    SURVEY §4.
  *  - q326: Haar wavelet energy decomposition of the daily value
  *    series. The unnormalized integer Haar transform (pair sums and
  *    pair differences, recursively on the sums) splits the series'
  *    variance across dyadic scales EXACTLY in integer arithmetic —
  *    no libm, no floats: energy at level L = Σ(pairwise detail
  *    coefficients)². A day-scale spike, a week-scale rhythm and a
  *    fortnight drift land in different levels — the multi-scale
  *    screen q235's single-scale burst detector cannot express.
  *    5 bounded Scala rounds of (type, index-div-2) aggregations on
  *    the 32-padded calendar frame; the oracle unrolls the identical
  *    5 stages. Milli units keep every squared detail in int64.
  */
object PipelineQueries55 {

  private val Levels = 5 // 32-day padded series

  val defs: Seq[QDef] = Seq(

    QDef("q325_skew_salting_advisor",
      (s, dir) => {
        def keyStats(name: String, df: DataFrame, key: String) = {
          val perKey = df.groupBy(col(key).as("k"))
            .agg(count(lit(1)).as("c"))
          perKey.agg(sum("c").as("n"), count(lit(1)).as("d"),
            max("c").as("maxc"))
            .select(lit(name).as("key_col"), col("n"), col("d"),
              col("maxc"),
              expr("maxc * d * 1000L div n").as("skew_x_milli"),
              expr("(maxc + greatest(1L, n div 32) - 1L) div " +
                "greatest(1L, n div 32)").as("salt_factor"))
        }
        val li = Tables.lineitem(s, dir)
        keyStats("lineitem.l_orderkey", li, "l_orderkey")
          .unionByName(keyStats("lineitem.l_partkey", li, "l_partkey"))
          .unionByName(keyStats("lineitem.l_suppkey", li, "l_suppkey"))
          .unionByName(keyStats("orders.o_custkey",
            Tables.orders(s, dir), "o_custkey"))
          .unionByName(keyStats("events.user_id",
            Tables.events(s, dir), "user_id"))
      },
      Some {
        def one(name: String, t: String, k: String) =
          s"""SELECT '$name' AS key_col,
             |  CAST(sum(c) AS BIGINT) AS n,
             |  CAST(count(*) AS BIGINT) AS d,
             |  CAST(max(c) AS BIGINT) AS maxc,
             |  CAST(max(c) AS BIGINT) * CAST(count(*) AS BIGINT)
             |    * 1000 // CAST(sum(c) AS BIGINT) AS skew_x_milli,
             |  (CAST(max(c) AS BIGINT)
             |    + greatest(1, CAST(sum(c) AS BIGINT) // 32) - 1)
             |    // greatest(1, CAST(sum(c) AS BIGINT) // 32)
             |    AS salt_factor
             |FROM (SELECT $k, CAST(count(*) AS BIGINT) AS c
             |  FROM $t GROUP BY 1)""".stripMargin
        Some(Seq(
          one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
          one("lineitem.l_partkey", "lineitem", "l_partkey"),
          one("lineitem.l_suppkey", "lineitem", "l_suppkey"),
          one("orders.o_custkey", "orders", "o_custkey"),
          one("events.user_id", "events", "user_id"))
          .mkString("\nUNION ALL\n"))
      }.get),

    QDef("q326_haar_energy",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(min("ts")).as("d0"))
        val daily = ev.crossJoin(broadcast(bounds))
          .select(col("event_type"),
            datediff(to_date(col("ts")), col("d0")).cast("long")
              .as("d"),
            floor(col("value") * lit(1000.0)).cast("long").as("vk"))
          .groupBy("event_type", "d")
          .agg(expr("sum(vk) div count(*)").as("x"))
        // 32-slot zero-padded series per type (types × 32 — bounded)
        val types = daily.select("event_type").distinct()
        val spine = s.range(0, 1L << Levels).toDF("d")
        var cur = types.crossJoin(broadcast(spine))
          .join(daily, Seq("event_type", "d"), "left")
          .withColumn("x", coalesce(col("x"), lit(0L)))
          .select("event_type", "d", "x")
        val energies = (1 to Levels).map { lvl =>
          val stage = cur
            .groupBy(col("event_type"), expr("d div 2").as("d"))
            .agg(sum("x").as("x"),
              sum(when(pmod(col("d"), lit(2L)) === 0, col("x"))
                .otherwise(-col("x"))).as("detail"))
            .localCheckpoint() // next level reads the sums
          val e = stage.groupBy("event_type")
            .agg(lit(lvl.toLong).as("level"),
              count(lit(1)).as("n_coef"),
              sum(col("detail") * col("detail")).as("energy"))
          cur = stage.select("event_type", "d", "x")
          e
        }
        energies.reduce(_ unionByName _)
          .select("event_type", "level", "n_coef", "energy")
      },
      Some {
        val stages = (1 to Levels).map { l =>
          val prev = if (l == 1) "p0" else s"p${l - 1}"
          s"""p$l AS MATERIALIZED (SELECT event_type, d // 2 AS d,
             |    CAST(sum(x) AS BIGINT) AS x,
             |    CAST(sum(CASE WHEN d % 2 = 0 THEN x ELSE -x END)
             |      AS BIGINT) AS detail
             |  FROM $prev GROUP BY 1, 2)""".stripMargin
        }
        val unions = (1 to Levels).map { l =>
          s"""SELECT event_type, CAST($l AS BIGINT) AS level,
             |  CAST(count(*) AS BIGINT) AS n_coef,
             |  CAST(sum(detail * detail) AS BIGINT) AS energy
             |FROM p$l GROUP BY 1""".stripMargin
        }
        Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0 FROM events),
                |dy AS (SELECT event_type,
                |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT)
                |      AS d,
                |    CAST(sum(CAST(floor(value * 1000.0) AS BIGINT))
                |      AS BIGINT)
                |      // CAST(count(*) AS BIGINT) AS x
                |  FROM events, b GROUP BY 1, 2),
                |ty AS (SELECT DISTINCT event_type FROM dy),
                |sp AS (SELECT CAST(unnest(generate_series(0,
                |    ${(1 << Levels) - 1})) AS BIGINT) AS d),
                |p0 AS (SELECT ty.event_type, sp.d,
                |    coalesce(dy.x, 0) AS x
                |  FROM ty CROSS JOIN sp LEFT JOIN dy
                |    ON dy.event_type = ty.event_type AND dy.d = sp.d),
                |${stages.mkString(",\n")}
                |${unions.mkString("\nUNION ALL\n")}""".stripMargin)
      }.get)
  )
}
