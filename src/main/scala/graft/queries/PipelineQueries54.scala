package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Fifty-fourth pipeline group — dedup governance and replica
  * reconciliation:
  *
  *  - q323: canonical-selection quality audit. Every dedup in this
  *    tree keeps the MINIMUM doc_id of a duplicate group (cheap,
  *    deterministic, join-free) — but is the id-canonical copy the
  *    BEST copy? Near-duplicate pairs differ slightly, and "slightly"
  *    is sometimes boilerplate injected into one of the two. The
  *    audit scores both sides of every q25 near-dup pair with the
  *    lexical type-token ratio (integer milli) and reports how often
  *    min-id keeps the lower-TTR copy and how much quality the
  *    max-TTR policy would add. Runs on the LSH-bounded pair list —
  *    never corpus-quadratic.
  *  - q324: Merkle-level reconciliation signatures (anti-entropy).
  *    Replicated stores diff by exchanging level-wise xor signatures
  *    and descending only into unequal nodes (Dynamo/Cassandra
  *    anti-entropy). Levels: 32 shards → 8 → 2 → root, each an xor of
  *    per-row content hashes — xor is associative/commutative and
  *    self-inverse, so every level folds from the one below it (one
  *    corpus scan total) and a single-row difference flips exactly
  *    one node per level (the localization property, spec-pinned).
  */
object PipelineQueries54 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "CAST('0x' || substr(md5(__T__), 1, 8) AS BIGINT)"
  private val NShards = 32

  val defs: Seq[QDef] = Seq(

    QDef("q323_canonical_quality_audit",
      (s, dir) => {
        val pairs = Dedup.nearDupMinhashArtifact(
          Tables.documents(s, dir), "doc_id", "text",
          fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"))
        val ttr = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 1)
          .select(col("doc_id"),
            expr("size(array_distinct(toks)) * 1000L div size(toks)")
              .as("q"))
        pairs
          .join(ttr.select(col("doc_id").as("doc_a"),
            col("q").as("qa")), "doc_a")
          .join(ttr.select(col("doc_id").as("doc_b"),
            col("q").as("qb")), "doc_b")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("qa") < col("qb"), 1L).otherwise(0L))
              .as("n_canonical_worse"),
            sum(greatest(col("qa"), col("qb")) - col("qa"))
              .as("lost_quality_milli"))
          .select(col("n_pairs"), col("n_canonical_worse"),
            expr("n_canonical_worse * 1000000L div n_pairs")
              .as("worse_frac_micro"),
            expr("lost_quality_milli div n_pairs")
              .as("mean_lost_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks
              |  FROM documents),
              |sh AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")})) AS sh
              |  FROM t),
              |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh)
              |        - len(list_intersect(a.sh, b.sh))) >= 0.8),
              |q AS (SELECT doc_id,
              |    CAST(len(list_distinct(toks)) AS BIGINT) * 1000
              |      // CAST(len(toks) AS BIGINT) AS q
              |  FROM t WHERE len(toks) >= 1),
              |j AS (SELECT qa.q AS qa, qb.q AS qb
              |  FROM p JOIN q qa ON p.doc_a = qa.doc_id
              |    JOIN q qb ON p.doc_b = qb.doc_id),
              |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              |    CAST(sum(CASE WHEN qa < qb THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_canonical_worse,
              |    CAST(sum(greatest(qa, qb) - qa) AS BIGINT)
              |      AS lost_quality_milli
              |  FROM j)
              |SELECT n_pairs, n_canonical_worse,
              |  n_canonical_worse * 1000000 // n_pairs
              |    AS worse_frac_micro,
              |  lost_quality_milli // n_pairs AS mean_lost_milli
              |FROM ag""".stripMargin)),

    QDef("q324_merkle_levels",
      (s, dir) => {
        val rows = Tables.documents(s, dir)
          .select(pmod(tokenHash(concat(lit("sh:"),
            col("doc_id").cast("string"))), lit(NShards.toLong))
            .as("shard"),
            tokenHash(concat(col("doc_id").cast("string"), lit(":"),
              col("text"))).as("h"))
        val l0 = rows.groupBy("shard")
          .agg(expr("bit_xor(h)").as("sig"), count(lit(1)).as("n"))
          .localCheckpoint() // folded three more times below
        def fold(df: org.apache.spark.sql.DataFrame, div: Int) =
          df.groupBy(expr(s"shard div $div").as("shard"))
            .agg(expr("bit_xor(sig)").as("sig"), sum("n").as("n"))
        val l1 = fold(l0, 4)
        val l2 = fold(l0, 16)
        val l3 = fold(l0, 32)
        l0.select(lit(0L).as("level"), col("shard").as("node"),
            col("sig"), col("n").as("n_rows"))
          .unionByName(l1.select(lit(1L).as("level"),
            col("shard").as("node"), col("sig"), col("n").as("n_rows")))
          .unionByName(l2.select(lit(2L).as("level"),
            col("shard").as("node"), col("sig"), col("n").as("n_rows")))
          .unionByName(l3.select(lit(3L).as("level"),
            col("shard").as("node"), col("sig"), col("n").as("n_rows")))
      },
      Some(s"""WITH r AS (SELECT
              |    CAST('0x' || substr(md5('sh:' ||
              |      CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              |      % $NShards AS shard,
              |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
              |      || ':' || text), 1, 8) AS BIGINT) AS h
              |  FROM documents),
              |l0 AS (SELECT shard, CAST(bit_xor(h) AS BIGINT) AS sig,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM r GROUP BY 1)
              |SELECT CAST(0 AS BIGINT) AS level,
              |  CAST(shard AS BIGINT) AS node, sig, n AS n_rows
              |FROM l0
              |UNION ALL
              |SELECT 1, shard // 4, CAST(bit_xor(sig) AS BIGINT),
              |  CAST(sum(n) AS BIGINT)
              |FROM l0 GROUP BY 2
              |UNION ALL
              |SELECT 2, shard // 16, CAST(bit_xor(sig) AS BIGINT),
              |  CAST(sum(n) AS BIGINT)
              |FROM l0 GROUP BY 2
              |UNION ALL
              |SELECT 3, shard // 32, CAST(bit_xor(sig) AS BIGINT),
              |  CAST(sum(n) AS BIGINT)
              |FROM l0 GROUP BY 2""".stripMargin))
  )
}
