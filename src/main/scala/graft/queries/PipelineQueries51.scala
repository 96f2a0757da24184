package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Fifty-first pipeline group — the two classic DECORRELATION shapes
  * (TPC-H Q17 / Q22) the relational family (q1-q16) did not yet
  * exercise. Correlated scalar subqueries are where naive engines
  * re-execute the inner query per outer row; the Spark-first plan
  * aggregates once and joins — the decorrelation Catalyst would also
  * apply to the SQL form, but written directly so the plan shape is
  * explicit and contract-checkable.
  *
  *  - q317: small-quantity revenue (Q17 shape) — revenue locked in
  *    orders whose line quantity is below 20% of that part's average.
  *    The per-part average arrives as ONE aggregation joined back on
  *    partkey; the 0.2·avg comparison is cross-multiplied into
  *    integers (5·qty·cnt < Σqty — no fractional average, no float
  *    threshold), micro-quantity and milli-price units.
  *  - q318: lapsed high-balance customers (Q22 shape) — customers
  *    above the global positive-balance average with NO order in the
  *    feed's final 30 days (the literal "never ordered" is near-empty
  *    in this data — measured — so the anti-join side is the recent
  *    window, which keeps the shape AND a meaningful result set). The
  *    global average is a broadcast scalar compared cross-multiplied;
  *    the absence test is a LEFT ANTI join (never a NOT IN — null-safe
  *    and shuffle-partitionable). Grouped by market segment.
  */
object PipelineQueries51 {

  val defs: Seq[QDef] = Seq(

    QDef("q317_small_quantity_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_partkey"),
            floor(col("l_quantity") * lit(1000000.0)).cast("long")
              .as("qm"),
            floor(col("l_extendedprice") * lit(1000.0)).cast("long")
              .as("pm"))
        val perPart = li.groupBy("l_partkey")
          .agg(sum("qm").as("sq"), count(lit(1)).as("cq"))
        li.join(perPart, "l_partkey")
          .filter(col("qm") * 5 * col("cq") < col("sq"))
          .agg(count(lit(1)).as("n_small"),
            count_distinct(col("l_partkey")).as("n_parts"),
            coalesce(sum("pm"), lit(0L)).as("revenue_milli"))
      },
      Some("""WITH li AS (SELECT l_partkey,
             |    CAST(floor(l_quantity * 1000000.0) AS BIGINT) AS qm,
             |    CAST(floor(l_extendedprice * 1000.0) AS BIGINT)
             |      AS pm
             |  FROM lineitem),
             |pp AS (SELECT l_partkey,
             |    CAST(sum(qm) AS BIGINT) AS sq,
             |    CAST(count(*) AS BIGINT) AS cq
             |  FROM li GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_small,
             |  CAST(count(DISTINCT li.l_partkey) AS BIGINT)
             |    AS n_parts,
             |  coalesce(CAST(sum(pm) AS BIGINT), 0) AS revenue_milli
             |FROM li JOIN pp USING (l_partkey)
             |WHERE qm * 5 * cq < sq""".stripMargin)),

    QDef("q318_idle_high_balance",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"),
            floor(col("c_acctbal") * lit(1000.0)).cast("long")
              .as("bm"))
        val avgPos = cust.filter(col("bm") > 0)
          .agg(sum("bm").as("sp"), count(lit(1)).as("np"))
        val orders = Tables.orders(s, dir)
        val cutoff = orders.agg(
          date_sub(to_date(max("o_orderdate")), 30).as("cut"))
        val recent = orders.crossJoin(broadcast(cutoff))
          .filter(to_date(col("o_orderdate")) >= col("cut"))
          .select(col("o_custkey").as("c_custkey"))
        val idle = cust
          .crossJoin(broadcast(avgPos))
          .filter(col("bm") * col("np") > col("sp"))
          .join(recent, Seq("c_custkey"), "left_anti")
        idle.groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            sum("bm").as("balance_milli"))
      },
      Some("""WITH c AS (SELECT c_custkey, c_mktsegment,
             |    CAST(floor(c_acctbal * 1000.0) AS BIGINT) AS bm
             |  FROM customer),
             |a AS (SELECT CAST(sum(bm) AS BIGINT) AS sp,
             |    CAST(count(*) AS BIGINT) AS np
             |  FROM c WHERE bm > 0),
             |cut AS (SELECT max(o_orderdate::DATE) - INTERVAL 30 DAY
             |    AS cut FROM orders),
             |r AS (SELECT DISTINCT o_custkey FROM orders, cut
             |  WHERE o_orderdate::DATE >= cut)
             |SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  CAST(sum(bm) AS BIGINT) AS balance_milli
             |FROM c, a
             |WHERE bm * np > sp
             |  AND c_custkey NOT IN (SELECT o_custkey FROM r)
             |GROUP BY 1""".stripMargin))
  )
}
