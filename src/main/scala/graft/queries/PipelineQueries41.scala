package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._

/** Forty-first pipeline group — honesty audits of the engine's own
  * infrastructure:
  *
  *  - q297: hash-collision census — the repo's corpus shuffles carry
  *    32-bit token hashes by house rule; this query MEASURES what
  *    that costs: distinct tokens vs distinct hashes per lang and the
  *    number of hash buckets holding ≥2 different tokens (birthday
  *    expectation ≈ V²/2³³ — observable even at test vocabulary
  *    sizes). The audit a reviewer would ask for before trusting any
  *    hash-keyed count.
  *  - q298: zone-map shard skipping — the lakehouse data-skipping
  *    decision quantified: with docs hash-sharded, each shard keeps a
  *    source-presence bitmask (sources are bounded → one long) and a
  *    char-length zone map; for every source, how many shards a
  *    source-filtered scan may skip. Presence masks build in ONE
  *    aggregation (bit_or of per-row bits); the per-source skipping
  *    table is arithmetic over O(#shards · #sources) bounded frames.
  */
object PipelineQueries41 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  val defs: Seq[QDef] = Seq(

    QDef("q297_hash_collision_census",
      (s, dir) => {
        val tk = Tables.documents(s, dir)
          .select(col("lang"), explode(tokens(col("text"))).as("tok"))
          .distinct()
          .select(col("lang"), col("tok"), tokenHash(col("tok")).as("h"))
          .localCheckpoint() // the distinct counts + bucket census
        val per = tk.groupBy("lang")
          .agg(count(lit(1)).as("n_tokens"),
            count_distinct(col("h")).as("n_hashes"))
        val coll = tk.groupBy("lang", "h")
          .agg(count_distinct(col("tok")).as("nt"))
          .filter(col("nt") >= 2)
          .groupBy("lang").agg(count(lit(1)).as("colliding_buckets"))
        per.join(coll, Seq("lang"), "left")
          .selectExpr("lang", "n_tokens", "n_hashes",
            "n_tokens - n_hashes AS lost_tokens",
            "coalesce(colliding_buckets, 0L) AS colliding_buckets")
      },
      Some(s"""WITH tk AS MATERIALIZED (SELECT DISTINCT lang, tok,
              |    ${hashSql("tok")} AS h
              |  FROM (SELECT lang, unnest($toksSql) AS tok
              |        FROM documents)),
              |p AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
              |    CAST(count(DISTINCT h) AS BIGINT) AS n_hashes
              |  FROM tk GROUP BY 1),
              |c AS (SELECT lang, CAST(count(*) AS BIGINT)
              |      AS colliding_buckets
              |  FROM (SELECT lang, h FROM tk GROUP BY lang, h
              |        HAVING count(DISTINCT tok) >= 2)
              |  GROUP BY lang)
              |SELECT lang, n_tokens, n_hashes,
              |  n_tokens - n_hashes AS lost_tokens,
              |  coalesce(colliding_buckets, 0) AS colliding_buckets
              |FROM p LEFT JOIN c USING (lang)""".stripMargin)),

    QDef("q298_zone_map_skipping",
      (s, dir) => {
        val srcIdx = Tables.documents(s, dir)
          .select(col("source")).distinct()
          .select(col("source"),
            (dense_rank().over(org.apache.spark.sql.expressions.Window
              .orderBy("source")) - 1).cast("int").as("sidx"))
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("shard",
            pmod(tokenHash(concat(lit("zm:"),
              col("doc_id").cast("string"))), lit(32L)))
          .join(broadcast(srcIdx), "source")
        val zones = d.groupBy("shard")
          .agg(expr("bit_or(shiftleft(1L, sidx))").as("mask"))
          .localCheckpoint() // per-source probe reads it per source
        val nShards = lit(32L)
        srcIdx.crossJoin(zones)
          .withColumn("present",
            expr("(mask >> sidx) & 1").cast("long"))
          .groupBy("source")
          .agg(sum("present").as("shards_containing"))
          .select(col("source"), nShards.as("n_shards"),
            col("shards_containing"),
            expr("(1000 * (32 - shards_containing)) div 32")
              .as("skip_milli"))
      },
      Some(s"""WITH si AS (SELECT source,
              |    CAST(dense_rank() OVER (ORDER BY source) - 1 AS INT)
              |      AS sidx
              |  FROM (SELECT DISTINCT source FROM documents)),
              |d AS (SELECT doc_id, d.source, sidx,
              |    ${hashSql("'zm:' || CAST(doc_id AS VARCHAR)")} % 32
              |      AS shard
              |  FROM documents d JOIN si ON d.source = si.source),
              |z AS (SELECT shard,
              |    CAST(bit_or(1::BIGINT << sidx) AS BIGINT) AS mask
              |  FROM d GROUP BY shard),
              |pr AS (SELECT si.source,
              |    CAST(sum((mask >> sidx) & 1) AS BIGINT)
              |      AS shards_containing
              |  FROM si CROSS JOIN z GROUP BY si.source)
              |SELECT source, CAST(32 AS BIGINT) AS n_shards,
              |  shards_containing,
              |  CAST((1000 * (32 - shards_containing)) // 32 AS BIGINT)
              |    AS skip_milli
              |FROM pr""".stripMargin))
  )
}
