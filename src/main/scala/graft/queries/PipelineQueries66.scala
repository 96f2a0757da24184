package graft.queries

import graft.Tables
import graft.ops.Sketches
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sixty-sixth pipeline group — probability calibration and the
  * resharding cost audit:
  *
  *  - q349: isotonic calibration (pool-adjacent-violators) of a
  *    backtested conversion predictor: score = each user's purchase
  *    milli-rate over the FIRST half of the calendar, outcome =
  *    whether they purchase in the SECOND half (leak-free by
  *    construction, the q319 discipline). Scores bin into 16 buckets
  *    (bounded), and PAV — inherently sequential — runs DRIVER-side
  *    on the ≤16-row bin table with exact integer pooling
  *    (pooled rate = Σpos·1000 div Σn), its fitted steps embedded as
  *    oracle literals (q339 rule) while the bin stats are
  *    SQL-recomputed. Monotonicity is pinned by spec.
  *  - q350: resharding movement audit — when a cluster grows 8 → 9
  *    nodes, what fraction of keys move under (a) mod-N assignment
  *    (theory: ~N/(N+1) ≈ 89%) vs (b) a consistent-hash ring with 16
  *    virtual nodes each (theory: ~1/(N+1) ≈ 11%)? All hashes are the
  *    portable md5-based hash60 so both engines compute the SAME ring
  *    and the SAME owners; the ring is an O(nodes·vnodes) literal-free
  *    derived table. The number that justifies consistent hashing in
  *    every shard-map design in SURVEY §4.
  */
object PipelineQueries66 {

  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  private val Bins = 16
  private val VNodes = 16
  private val NodesBefore = 8

  private object IsoOracle {
    @volatile var sql: Option[String] = None
  }

  /** Pool-adjacent-violators on (n, pos) bins, exact integers: pooled
    * blocks carry (Σn, Σpos); a block's rate is Σpos·1000 div Σn and
    * blocks merge while a later block's CROSS-MULTIPLIED rate is below
    * an earlier one's (posA·nB > posB·nA — no division until the
    * final report, so pooling order cannot lose precision).
    */
  def pav(bins: Seq[(Long, Long)]): Seq[Long] = {
    case class Block(n: Long, pos: Long, span: Int)
    val stack = scala.collection.mutable.ArrayBuffer[Block]()
    bins.foreach { case (n, pos) =>
      stack += Block(n, pos, 1)
      while (stack.length > 1 &&
        stack(stack.length - 2).pos * stack.last.n >
          stack.last.pos * stack(stack.length - 2).n) {
        val b = stack.remove(stack.length - 1)
        val a = stack.remove(stack.length - 1)
        stack += Block(a.n + b.n, a.pos + b.pos, a.span + b.span)
      }
    }
    stack.toSeq.flatMap(b =>
      Seq.fill(b.span)(if (b.n == 0) 0L else b.pos * 1000L / b.n))
  }

  val defs: Seq[QDef] = Seq(

    QDef("q349_isotonic_calibration",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("event_type"))
        val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
          .withColumn("mid", expr("date_add(d0, " +
            "cast(datediff(d1, d0) div 2 as int))"))
        val tagged = ev.crossJoin(broadcast(bounds))
        val first = tagged.filter(col("day") <= col("mid"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_ev"),
            sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("n_buy"))
          .select(col("user_id"),
            expr("n_buy * 1000L div n_ev").as("score_milli"))
        val second = tagged.filter(col("day") > col("mid") &&
            col("day") <= date_add(col("mid"), 1))
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("outcome"))
        val binned = first.join(second, Seq("user_id"), "left")
          .select(
            least(lit(Bins - 1L),
              expr(s"score_milli * $Bins div 1000")).as("bin"),
            coalesce(col("outcome"), lit(0L)).as("y"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum("y").as("pos"))
          .orderBy("bin")
        val stats = binned.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val iso = pav(stats.map(t => (t._2, t._3)).toSeq)
        val out = stats.zip(iso).map { case ((b, n, pos), m) =>
          (b, n, pos, if (n == 0) 0L else pos * 1000L / n, m)
        }
        IsoOracle.sql = Some {
          val lits = out.map { case (b, _, _, _, m) => s"($b, $m)" }
            .mkString(", ")
          s"""WITH e AS (SELECT user_id, ts::DATE AS day, event_type
             |  FROM events),
             |b AS (SELECT min(day) AS d0, max(day) AS d1,
             |    min(day) + CAST(date_diff('day', min(day), max(day))
             |      // 2 AS INTEGER) AS mid
             |  FROM e),
             |f AS (SELECT user_id,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) * 1000 //
             |      CAST(count(*) AS BIGINT) AS score_milli
             |  FROM e, b WHERE day <= mid GROUP BY user_id),
             |s2 AS (SELECT user_id,
             |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) AS outcome
             |  FROM e, b WHERE day > mid AND day <= mid + 1
             |  GROUP BY user_id),
             |z AS (SELECT least(${Bins - 1},
             |      f.score_milli * $Bins // 1000) AS bin,
             |    coalesce(s2.outcome, 0) AS y
             |  FROM f LEFT JOIN s2 USING (user_id)),
             |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(y) AS BIGINT) AS pos
             |  FROM z GROUP BY bin),
             |iso(bin, iso_milli) AS (VALUES $lits)
             |SELECT g.bin, g.n, g.pos,
             |  CASE WHEN g.n = 0 THEN 0
             |    ELSE g.pos * 1000 // g.n END AS raw_milli,
             |  CAST(iso_milli AS BIGINT) AS iso_milli
             |FROM g JOIN iso USING (bin)""".stripMargin
        }
        s.createDataFrame(
          s.sparkContext.parallelize(out.toSeq.map { case (b, n, p, r, m) =>
            Row(b, n, p, r, m)
          }, 1),
          StructType(Seq(StructField("bin", LongType),
            StructField("n", LongType), StructField("pos", LongType),
            StructField("raw_milli", LongType),
            StructField("iso_milli", LongType))))
      },
      None,
      Some(() => IsoOracle.sql)),

    QDef("q350_resharding_audit",
      (s, dir) => {
        val keys = Tables.events(s, dir)
          .select(col("user_id")).distinct()
          .select(col("user_id"),
            Sketches.hash60(concat(lit("key:"),
              col("user_id").cast("string"))).as("h"))
          .localCheckpoint() // both schemes read it
        // mod scheme: owner flips unless h ≡ (mod lcm) agree — count
        val modMoved = keys
          .select((pmod(col("h"), lit(NodesBefore.toLong)) =!=
            pmod(col("h"), lit(NodesBefore + 1L))).cast("long")
            .as("moved"))
          .agg(count(lit(1)).as("n_keys"), sum("moved").as("moved"))
          .select(lit("mod").as("scheme"), col("n_keys"), col("moved"),
            expr("moved * 1000L div n_keys").as("moved_milli"))
        // consistent ring: nodes × vnodes positions, owner = argmin
        // clockwise distance (pos − h mod 2^60); derived identically
        // in both engines from the portable hash
        def ring(nodes: Int) = s.range(0, nodes.toLong)
          .select(col("id").as("node"))
          .crossJoin(s.range(0, VNodes.toLong).select(col("id").as("v")))
          .select(col("node"),
            Sketches.hash60(concat(lit("ring:"), col("node"), lit(":"),
              col("v"))).as("pos"))
        def owner(nodes: Int, outCol: String) = keys
          .crossJoin(broadcast(ring(nodes)))
          .select(col("user_id"), col("h"),
            struct(pmod(col("pos") - col("h"), lit(1L << 60)).as("d"),
              col("node")).as("cand"))
          .groupBy("user_id")
          .agg(min("cand").getField("node").as(outCol))
        val ringMoved = owner(NodesBefore, "o8")
          .join(owner(NodesBefore + 1, "o9"), "user_id")
          .select((col("o8") =!= col("o9")).cast("long").as("moved"))
          .agg(count(lit(1)).as("n_keys"), sum("moved").as("moved"))
          .select(lit("ring").as("scheme"), col("n_keys"), col("moved"),
            expr("moved * 1000L div n_keys").as("moved_milli"))
        modMoved.unionByName(ringMoved)
      },
      Some {
        def ringSql(nodes: Int, name: String) =
          s"""$name AS (SELECT n.node, v.v,
             |    ${hash60Sql("'ring:' || n.node || ':' || v.v")} AS pos
             |  FROM (SELECT unnest(range(0, $nodes)) AS node) n,
             |    (SELECT unnest(range(0, $VNodes)) AS v) v)"""
            .stripMargin
        def ownerSql(ring: String, name: String) =
          s"""$name AS (SELECT user_id,
             |    min({'d': (pos - h) % ${1L << 60} +
             |      CASE WHEN (pos - h) % ${1L << 60} < 0
             |        THEN ${1L << 60} ELSE 0 END,
             |      'node': node}).node AS o
             |  FROM k, $ring GROUP BY user_id)""".stripMargin
        s"""WITH k AS MATERIALIZED (SELECT DISTINCT user_id,
           |    ${hash60Sql("'key:' || CAST(user_id AS VARCHAR)")} AS h
           |  FROM events),
           |${ringSql(NodesBefore, "r8")},
           |${ringSql(NodesBefore + 1, "r9")},
           |${ownerSql("r8", "o8")},
           |${ownerSql("r9", "o9")},
           |ring AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |    CAST(sum(CASE WHEN o8.o <> o9.o THEN 1 ELSE 0 END)
           |      AS BIGINT) AS moved
           |  FROM o8 JOIN o9 USING (user_id)),
           |md AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
           |    CAST(sum(CASE WHEN h % $NodesBefore <>
           |      h % ${NodesBefore + 1} THEN 1 ELSE 0 END) AS BIGINT)
           |      AS moved
           |  FROM k)
           |SELECT 'mod' AS scheme, n_keys, moved,
           |  moved * 1000 // n_keys AS moved_milli FROM md
           |UNION ALL
           |SELECT 'ring', n_keys, moved,
           |  moved * 1000 // n_keys FROM ring""".stripMargin
      })
  )
}
