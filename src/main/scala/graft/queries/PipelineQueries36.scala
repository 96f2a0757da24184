package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._

/** Thirty-sixth pipeline group — physical data layout and basket
  * association:
  *
  *  - q286: Z-order (Morton) shard locality audit — interleave the low
  *    16 bits of (user, day) into a space-filling-curve key, shard by
  *    its high bits, and measure per-shard user/day spread against a
  *    hash-sharding baseline on the SAME rows. This is the layout
  *    decision behind Z-ORDER clustering in lakehouse tables: a shard
  *    that covers few users × few days serves both user- and
  *    day-predicate scans with less read amplification. The bit
  *    interleave is pure integer shifts generated token-for-token for
  *    both engines — no hash, no float.
  *  - q287: event-type co-occurrence (market-basket) — support /
  *    confidence / lift over (user, day) baskets. The corpus
  *    collapses to distinct (basket, type) rows ONCE; the pair join
  *    fans out within baskets only (≤ |types|² per basket, |types|
  *    is 5); margins re-aggregate the item frame. Complements q166
  *    (sequential transitions) and q145 (time-window copresence) with
  *    order-free same-basket association.
  */
object PipelineQueries36 {

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** The 16+16 → 32-bit Morton interleave over columns `ux`/`dy`,
    * generated as the same shift/mask tree for each engine. */
  private def mortonSpark: String =
    (0 until 16).map(i =>
      s"shiftleft(shiftright(ux, $i) & 1, ${2 * i})" +
        s" + shiftleft(shiftright(dy, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")
  private def mortonDuck: String =
    (0 until 16).map(i =>
      s"((((ux >> $i) & 1) << ${2 * i})" +
        s" + (((dy >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" + ")

  val defs: Seq[QDef] = Seq(

    QDef("q286_zorder_locality",
      (s, dir) => {
        val base = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .withColumn("ux", expr("user_id & 65535"))
          .withColumn("dy", expr("day & 65535"))
          .withColumn("z", expr(mortonSpark))
          .select(col("user_id"), col("day"),
            expr("shiftright(z, 26)").as("zs"),
            pmod(tokenHash(concat(lit("zs:"),
              col("user_id").cast("string"), lit(":"),
              col("day").cast("string"))), lit(64L)).as("hs"))
          .select(col("user_id"), col("day"),
            explode(array(
              struct(lit("zorder").as("scheme"), col("zs").as("shard")),
              struct(lit("hash").as("scheme"), col("hs").as("shard"))))
              .as("sc"))
          .select(col("sc.scheme").as("scheme"),
            col("sc.shard").cast("long").as("shard"),
            col("user_id"), col("day"))
          .localCheckpoint() // three rollups read it
        val ev = base.groupBy("scheme", "shard")
          .agg(count(lit(1)).as("n_events"))
        val us = base.select("scheme", "shard", "user_id").distinct()
          .groupBy("scheme", "shard").agg(count(lit(1)).as("n_users"))
        val dy = base.select("scheme", "shard", "day").distinct()
          .groupBy("scheme", "shard").agg(count(lit(1)).as("n_days"))
        ev.join(us, Seq("scheme", "shard"))
          .join(dy, Seq("scheme", "shard"))
          .select(col("scheme"), col("shard"), col("n_events"),
            col("n_users"), col("n_days"))
      },
      Some(s"""WITH b0 AS (SELECT user_id,
              |    epoch_us(ts) // 86400000000 AS day FROM events),
              |b1 AS (SELECT user_id, day, user_id & 65535 AS ux,
              |    day & 65535 AS dy FROM b0),
              |b2 AS (SELECT user_id, day, ($mortonDuck) AS z,
              |    ${hashSql(
        "'zs:' || CAST(user_id AS VARCHAR) || ':' || CAST(day AS VARCHAR)")}
              |      % 64 AS hs
              |  FROM b1),
              |b AS (SELECT 'zorder' AS scheme,
              |    CAST(z >> 26 AS BIGINT) AS shard, user_id, day FROM b2
              |  UNION ALL
              |  SELECT 'hash', CAST(hs AS BIGINT), user_id, day FROM b2),
              |e AS (SELECT scheme, shard, CAST(count(*) AS BIGINT)
              |    AS n_events FROM b GROUP BY 1, 2),
              |u AS (SELECT scheme, shard,
              |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              |  FROM b GROUP BY 1, 2),
              |d AS (SELECT scheme, shard,
              |    CAST(count(DISTINCT day) AS BIGINT) AS n_days
              |  FROM b GROUP BY 1, 2)
              |SELECT scheme, shard, n_events, n_users, n_days
              |FROM e JOIN u USING (scheme, shard)
              |  JOIN d USING (scheme, shard)""".stripMargin)),

    QDef("q287_type_cooccurrence",
      (s, dir) => {
        val items = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            col("event_type"))
          .distinct()
          .localCheckpoint() // pair join sides + margins read it
        val nb = items.select("user_id", "day").distinct().count()
        val marg = items.groupBy("event_type").agg(count(lit(1)).as("m"))
        val pairs = items.as("a")
          .join(items.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.day") === col("b.day") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(marg.select(col("event_type").as("type_a"),
            col("m").as("na"))), "type_a")
          .join(broadcast(marg.select(col("event_type").as("type_b"),
            col("m").as("nb_"))), "type_b")
          .withColumn("nbaskets", lit(nb))
          .selectExpr("type_a", "type_b", "n_ab",
            "(1000000 * n_ab) div nbaskets AS support_micro",
            "(1000000 * n_ab) div na AS conf_micro",
            "(1000 * n_ab * nbaskets) div (na * nb_) AS lift_milli")
      },
      Some("""WITH i AS (SELECT DISTINCT user_id,
             |    epoch_us(ts) // 86400000000 AS day, event_type
             |  FROM events),
             |nb AS (SELECT CAST(count(*) AS BIGINT) AS nbaskets
             |  FROM (SELECT DISTINCT user_id, day FROM i)),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m
             |  FROM i GROUP BY 1),
             |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    CAST(count(*) AS BIGINT) AS n_ab
             |  FROM i a JOIN i b ON a.user_id = b.user_id
             |    AND a.day = b.day AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT type_a, type_b, n_ab,
             |  CAST((1000000 * n_ab) // nbaskets AS BIGINT)
             |    AS support_micro,
             |  CAST((1000000 * n_ab) // ma.m AS BIGINT) AS conf_micro,
             |  CAST((1000 * n_ab * nbaskets) // (ma.m * mb.m) AS BIGINT)
             |    AS lift_milli
             |FROM p JOIN m ma ON p.type_a = ma.event_type
             |  JOIN m mb ON p.type_b = mb.event_type
             |CROSS JOIN nb""".stripMargin))
  )
}
