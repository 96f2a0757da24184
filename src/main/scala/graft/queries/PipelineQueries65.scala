package graft.queries

import graft.Tables
import graft.ops.VectorSearch._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sixty-fifth pipeline group — the fourth optimizer advisor, label
  * coherence, and decayed monitoring counts:
  *
  *  - q346: System-R join-ORDER advisor over the 5-table TPC-H FK
  *    chain (region–nation–customer–orders–lineitem) — the member the
  *    advisor family (q320 cardinality, q325 skew, q333 size) was
  *    missing. Per-table row/distinct stats come from one bounded
  *    aggregate each; the left-deep enumeration (connected orders
  *    only) and the textbook estimate |A⋈B| = |A|·|B| div max(dv)
  *    run DRIVER-side over O(5!) integer candidates, and the chosen
  *    orders are embedded as literals in the oracle (q339 rule) while
  *    the stats fingerprint is SQL-recomputed — so the oracle still
  *    checks the data-dependent inputs.
  *  - q347: per-label embedding coherence — mean cosine of members to
  *    their label centroid. Centroids come from per-dimension integer
  *    MICRO sums (the q106 exact-long trick: one map-side-combined agg,
  *    d sum columns, O(#labels·d) to the driver — partition-order-
  *    proof), member cosines quantize to micro BEFORE the integer
  *    mean. The within-label twin of q267's between-cluster silhouette.
  *  - q348: exponentially-decayed event counts (λ = 0.9/day), the
  *    recency-weighted monitoring counter. 0.9^age is pow — not
  *    ulp-portable — so the 30 weights are ONE constant literal table
  *    shared by both engines; everything after is exact integers.
  */
object PipelineQueries65 {

  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)

  private object JoinOrderOracle {
    @volatile var sql: Option[String] = None
  }
  private object CoherenceOracle {
    @volatile var sql: Option[String] = None
  }

  private val DecayWeights: Seq[(Int, Long)] =
    (0 until 30).map(a => a -> math.floor(1000.0 * math.pow(0.9, a)).toLong)

  private def dbl(x: Double): String = {
    val s = java.lang.Double.toString(x)
    if (s.contains("E") || s.contains("e"))
      java.math.BigDecimal.valueOf(x).toPlainString
    else s
  }

  val defs: Seq[QDef] = Seq(

    QDef("q346_join_order_advisor",
      (s, dir) => {
        // FK chain edges: (table, key-to-parent, parent, parent-key)
        // with the System-R stats each estimate needs
        def stat(t: String, distinctCols: Seq[String]): (Long, Map[String, Long]) = {
          val df = s.read.parquet(s"$dir/$t.parquet")
          val aggs = count(lit(1)).as("n") +:
            distinctCols.map(c => count_distinct(col(c)).as(c))
          val r = df.agg(aggs.head, aggs.tail: _*).collect().head
          (r.getLong(0), distinctCols.zipWithIndex
            .map { case (c, i) => c -> r.getLong(i + 1) }.toMap)
        }
        val (nL, dL) = stat("lineitem", Seq("l_orderkey"))
        val (nO, dO) = stat("orders", Seq("o_orderkey", "o_custkey"))
        val (nC, dC) = stat("customer", Seq("c_custkey", "c_nationkey"))
        val (nN, dN) = stat("nation", Seq("n_nationkey", "n_regionkey"))
        val (nR, dR) = stat("region", Seq("r_regionkey"))
        val rows = Map("lineitem" -> nL, "orders" -> nO,
          "customer" -> nC, "nation" -> nN, "region" -> nR)
        // chain edges with per-table dv of the join attribute
        val edges: Map[Set[String], Map[String, Long]] = Map(
          Set("lineitem", "orders") -> Map(
            "lineitem" -> dL("l_orderkey"), "orders" -> dO("o_orderkey")),
          Set("orders", "customer") -> Map(
            "orders" -> dO("o_custkey"), "customer" -> dC("c_custkey")),
          Set("customer", "nation") -> Map(
            "customer" -> dC("c_nationkey"),
            "nation" -> dN("n_nationkey")),
          Set("nation", "region") -> Map(
            "nation" -> dN("n_regionkey"), "region" -> dR("r_regionkey")))
        val tables = rows.keys.toSeq.sorted
        // left-deep enumeration over CONNECTED orders: each joined
        // table must share a chain edge with the accumulated set
        def orders(acc: List[String], rest: Set[String])
            : Seq[List[String]] =
          if (rest.isEmpty) Seq(acc.reverse)
          else rest.toSeq.sorted
            .filter(t => acc.isEmpty ||
              acc.exists(a => edges.contains(Set(a, t))))
            .flatMap(t => orders(t :: acc, rest - t))
        // BigInt cost arithmetic: |A|·|B| overflows int64 for
        // warehouse-scale row counts; the model must not
        val plans = orders(Nil, tables.toSet).map { ord =>
          var inter = BigInt(rows(ord.head))
          var cost = BigInt(0)
          var joined = Set(ord.head)
          ord.tail.foreach { t =>
            val a = joined.find(a => edges.contains(Set(a, t))).get
            val dvs = edges(Set(a, t))
            val dv = (BigInt(dvs(a)).min(inter))
              .max(BigInt(dvs(t)).min(BigInt(rows(t)))).max(BigInt(1))
            inter = inter * rows(t) / dv
            cost += inter
            joined += t
          }
          (ord.mkString(">"),
            cost.min(BigInt(Long.MaxValue)).toLong)
        }.sortBy { case (o, c) => (c, o) }.take(3)
        val baseTotal = rows.values.sum
        JoinOrderOracle.sql = Some {
          val lits = plans.zipWithIndex.map { case ((o, c), i) =>
            s"(${i + 1}, '$o', $c)"
          }.mkString(", ")
          s"""WITH v(rank, join_order, est_cost_rows) AS (VALUES $lits),
             |s AS (SELECT
             |    (SELECT count(*) FROM lineitem) +
             |    (SELECT count(*) FROM orders) +
             |    (SELECT count(*) FROM customer) +
             |    (SELECT count(*) FROM nation) +
             |    (SELECT count(*) FROM region) AS base_rows_total)
             |SELECT CAST(rank AS BIGINT) AS rank, join_order,
             |  CAST(est_cost_rows AS BIGINT) AS est_cost_rows,
             |  CAST(base_rows_total AS BIGINT) AS base_rows_total
             |FROM v, s""".stripMargin
        }
        s.createDataFrame(
          s.sparkContext.parallelize(plans.zipWithIndex.map {
            case ((o, c), i) => Row(i + 1L, o, c, baseTotal)
          }, 1),
          StructType(Seq(StructField("rank", LongType),
            StructField("join_order", StringType),
            StructField("est_cost_rows", LongType),
            StructField("base_rows_total", LongType))))
      },
      None,
      Some(() => JoinOrderOracle.sql)),

    QDef("q347_label_coherence",
      (s, dir) => {
        val d = 64
        val emb = Tables.embeddings(s, dir)
          .select(col("label").cast("long").as("label"),
            toDouble(col("embedding")).as("v"))
          .localCheckpoint() // moment pass + cosine pass share it
        // per-(label, dim) exact micro sums — one map-side-combined agg
        val sumCols = (0 until d).map(i =>
          sum(round(element_at(col("v"), i + 1) * lit(1000000.0))
            .cast("long")).as(s"s$i"))
        val moments = emb.groupBy("label")
          .agg(count(lit(1)).as("n"), sumCols: _*)
          .collect()
        val cents: Map[Long, Array[Double]] = moments.map { r =>
          val n = r.getLong(1)
          r.getLong(0) -> Array.tabulate(d)(i =>
            (r.getLong(2 + i).toDouble / 1000000.0) / n)
        }.toMap
        CoherenceOracle.sql = Some {
          val whenSql = cents.toSeq.sortBy(_._1).map { case (l, c) =>
            val lit = c.map(dbl).mkString("[", ", ", "]")
            val nrm = dbl(math.sqrt(c.map(x => x * x).sum))
            s"WHEN label = $l THEN CAST(round(${dotSql("v", lit)} / " +
              s"(sqrt(${dotSql("v", "v")}) * $nrm) * 1000000.0, 0) " +
              s"AS BIGINT)"
          }.mkString("\n      ")
          s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
             |    $vSql AS v FROM embeddings),
             |c AS (SELECT label,
             |    CASE $whenSql END AS cmicro
             |  FROM e)
             |SELECT label, CAST(count(*) AS BIGINT) AS n,
             |  CAST(CASE WHEN sum(cmicro) < 0
             |    THEN -((-sum(cmicro)) // count(*))
             |    ELSE sum(cmicro) // count(*) END AS BIGINT)
             |    AS mean_cos_micro
             |FROM c GROUP BY label ORDER BY label""".stripMargin
        }
        val centLit = cents.toSeq.sortBy(_._1)
        val cosCol = centLit.foldLeft(lit(null).cast("long")) {
          case (acc, (l, c)) =>
            val nrm = math.sqrt(c.map(x => x * x).sum)
            when(col("label") === l,
              round(dot(col("v"), typedLit(c.toSeq)) /
                (norm(col("v")) * lit(nrm)) * lit(1000000.0), 0)
                .cast("long")).otherwise(acc)
        }
        emb.select(col("label"), cosCol.as("cmicro"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            // sign-split: Spark div truncates, DuckDB // floors —
            // they agree only on nonneg operands (house rule)
            expr("""CASE WHEN sum(cmicro) < 0
                   |  THEN -((-sum(cmicro)) div count(1))
                   |  ELSE sum(cmicro) div count(1) END"""
              .stripMargin).as("mean_cos_micro"))
          .orderBy("label")
      },
      None,
      Some(() => CoherenceOracle.sql)),

    QDef("q348_decayed_counts",
      (s, dir) => {
        val w = s.createDataFrame(
          s.sparkContext.parallelize(DecayWeights.map {
            case (a, wm) => Row(a.toLong, wm)
          }, 1),
          StructType(Seq(StructField("age", LongType),
            StructField("w_milli", LongType))))
        val ev = Tables.events(s, dir)
          .select(col("event_type"), to_date(col("ts")).as("day"))
        val maxDay = ev.agg(max("day").as("d1"))
        val daily = ev.crossJoin(broadcast(maxDay))
          .groupBy(col("event_type"),
            datediff(col("d1"), col("day")).cast("long").as("age"))
          .agg(count(lit(1)).as("c"))
        daily.join(broadcast(w), Seq("age"), "left")
          .groupBy("event_type")
          .agg(sum("c").as("raw_n"),
            sum(col("c") * coalesce(col("w_milli"), lit(0L)))
              .as("decayed_milli"))
          .orderBy("event_type")
      },
      Some {
        val lits = DecayWeights.map { case (a, wm) => s"($a, $wm)" }
          .mkString(", ")
        s"""WITH w(age, w_milli) AS (VALUES $lits),
           |m AS (SELECT max(ts::DATE) AS d1 FROM events),
           |d AS (SELECT event_type,
           |    date_diff('day', ts::DATE, m.d1) AS age,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events, m GROUP BY 1, 2)
           |SELECT event_type, CAST(sum(c) AS BIGINT) AS raw_n,
           |  CAST(sum(c * coalesce(w.w_milli, 0)) AS BIGINT)
           |    AS decayed_milli
           |FROM d LEFT JOIN w USING (age)
           |GROUP BY 1 ORDER BY 1""".stripMargin
      })
  )
}
