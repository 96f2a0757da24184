package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._

/** Forty-sixth pipeline group — storage-engineering audits, the
  * layout family's (q286 Z-order, q298 zone maps) missing two members:
  * what would an INDEX and a COLUMN ENCODING cost on this corpus?
  *
  *  - q307: posting-list delta-gap varint cost. For every term, the
  *    sorted doc-id posting list is delta-encoded and each gap costs
  *    ⌈bitlen(gap)/7⌉ LEB128 bytes — the standard inverted-index
  *    layout (Lucene/ES postings). The audit buckets terms by
  *    document-frequency magnitude (the house log-bucket: bitlen(df))
  *    and reports varint vs raw-int64 bytes per bucket: rare terms
  *    compress worst (gaps ≈ corpus size), stopwords compress ~8×
  *    (gaps ≈ 1). bitlen is `length(bin(x))` in DuckDB and
  *    `length(conv(x, 10, 2))` in Spark — the same engine-portable
  *    integer-log trick as the q264 sketch family, no libm anywhere.
  *    The corpus-side shuffle carries (term-hash, doc_id) longs only —
  *    never term text (house rule).
  *  - q308: columnar encoding advisor. For each candidate column the
  *    three decision inputs every columnar writer (Parquet/ORC) weighs:
  *    distinct-value count (dictionary viability), run count under the
  *    natural doc_id order (RLE viability — a run starts where the
  *    value differs from the previous row), and total byte volume.
  *    Runs are counted with a shuffle-free-by-key self-join on
  *    (col, doc_id) = (col, doc_id − 1) — NOT a single-partition
  *    window over the whole column (the per-column window would put
  *    each column's entire data through one task; the join
  *    hash-partitions on (col, doc_id) and scales). Verdict thresholds
  *    are explicit integers so the recommendation is deterministic:
  *    DICT when distinct ≤ 1/16 of rows, RLE when runs ≤ 1/4 of rows,
  *    else PLAIN.
  */
object PipelineQueries46 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "CAST('0x' || substr(md5(__T__), 1, 8) AS BIGINT)"

  val defs: Seq[QDef] = Seq(

    QDef("q307_postings_varint_cost",
      (s, dir) => {
        val post = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(array_distinct(transform(col("toks"),
              t => tokenHash(t)))).as("h"))
        // Two-level gap computation (the q84 shard-sum discipline): a
        // naive per-term collect is O(df) aggregation state and a
        // stopword term holds ~the whole corpus in one buffer. Blocking
        // by doc-id range bounds per-group state at B elements; the
        // inter-block gap (block min − previous block's max) comes from
        // a per-term lag over O(df/B) BLOCK rows. Consecutive-diff
        // algebra is blocking-invariant, so the flat DuckDB replay is
        // bit-identical.
        val B = 4096
        def varintBytes(g: org.apache.spark.sql.Column) =
          floor((length(conv(g.cast("string"), 10, 2)) + 6) / 7)
            .cast("long")
        val blocks = post
          .withColumn("blk", expr(s"doc_id div $B"))
          .groupBy("h", "blk")
          .agg(sort_array(collect_list("doc_id")).as("ds"))
          .select(col("h"), col("blk"),
            size(col("ds")).cast("long").as("cnt"),
            element_at(col("ds"), 1).as("lo"),
            element_at(col("ds"), -1).as("hi"),
            when(size(col("ds")) > 1,
              aggregate(
                transform(sequence(lit(2), size(col("ds"))), i =>
                  element_at(col("ds"), i) -
                    element_at(col("ds"), i - 1)),
                lit(0L), (acc, g) => acc + varintBytes(g)))
              .otherwise(lit(0L)).as("intra_bytes"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy("h").orderBy("blk")
        val perTerm = blocks
          .withColumn("prev_hi", lag("hi", 1).over(wb))
          .withColumn("head_bytes", varintBytes(
            when(col("prev_hi").isNull, col("lo") + 1)
              .otherwise(col("lo") - col("prev_hi"))))
          .groupBy("h")
          .agg(sum("cnt").as("df"),
            sum(col("intra_bytes") + col("head_bytes"))
              .as("varint_bytes"))
        perTerm
          .withColumn("df_bucket",
            length(conv(col("df").cast("string"), 10, 2)))
          .groupBy("df_bucket")
          .agg(count(lit(1)).as("n_terms"),
            sum("df").as("n_postings"),
            sum("varint_bytes").as("varint_bytes"),
            (sum("df") * 8).as("raw_bytes"))
          .withColumn("compression_x_micro",
            expr("raw_bytes * 1000000L div varint_bytes"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks
              |  FROM documents),
              |p AS (SELECT doc_id, unnest(list_distinct(list_transform(
              |    toks, tok -> ${tokenHashSql.replace("__T__", "tok")})))
              |    AS h
              |  FROM t),
              |pt AS (SELECT h, list_sort(list(doc_id)) AS ds
              |  FROM p GROUP BY h),
              |vb AS (SELECT h, CAST(len(ds) AS BIGINT) AS df,
              |    CAST(list_sum(list_transform(
              |      generate_series(1, len(ds)),
              |      i -> (length(bin(CASE WHEN i = 1 THEN ds[1] + 1
              |        ELSE ds[i] - ds[i-1] END)) + 6) // 7))
              |      AS BIGINT) AS varint_bytes
              |  FROM pt),
              |bk AS (SELECT CAST(length(bin(df)) AS INTEGER)
              |      AS df_bucket,
              |    CAST(count(*) AS BIGINT) AS n_terms,
              |    CAST(sum(df) AS BIGINT) AS n_postings,
              |    CAST(sum(varint_bytes) AS BIGINT) AS varint_bytes,
              |    CAST(sum(df) * 8 AS BIGINT) AS raw_bytes
              |  FROM vb GROUP BY 1)
              |SELECT df_bucket, n_terms, n_postings, varint_bytes,
              |  raw_bytes,
              |  raw_bytes * 1000000 // varint_bytes
              |    AS compression_x_micro
              |FROM bk""".stripMargin)),

    QDef("q308_encoding_advisor",
      (s, dir) => {
        // unpivot the three candidate columns to (col_name, doc_id, v)
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"),
            expr("stack(3, 'lang', lang, 'source', source, " +
              "'n_chars', cast(n_chars as string)) as (col_name, v)"))
        val n = docs.groupBy("col_name")
          .agg(count(lit(1)).as("n_rows"),
            count_distinct(col("v")).as("n_distinct"),
            sum(length(col("v"))).cast("long").as("plain_bytes"))
        // run starts: v(doc_id) != v(doc_id-1); the first row of each
        // column always starts a run. Hash-partitioned equi-join on
        // (col_name, doc_id) — no single-partition per-column window.
        val runs = docs.as("a")
          .join(docs.as("b"),
            col("a.col_name") === col("b.col_name") &&
              col("a.doc_id") === col("b.doc_id") + 1, "left")
          .groupBy(col("a.col_name").as("col_name"))
          .agg(sum(when(col("b.v").isNull ||
            col("a.v") =!= col("b.v"), 1L).otherwise(0L)).as("n_runs"))
        n.join(runs, "col_name")
          .select(col("col_name"), col("n_rows"), col("n_distinct"),
            col("n_runs"), col("plain_bytes"),
            when(col("n_distinct") * 16 <= col("n_rows"), lit("DICT"))
              .when(col("n_runs") * 4 <= col("n_rows"), lit("RLE"))
              .otherwise(lit("PLAIN")).as("encoding"))
      },
      Some("""WITH d AS (SELECT doc_id, col_name, v FROM (
             |    SELECT doc_id, 'lang' AS col_name, lang AS v
             |      FROM documents
             |    UNION ALL
             |    SELECT doc_id, 'source', source FROM documents
             |    UNION ALL
             |    SELECT doc_id, 'n_chars', CAST(n_chars AS VARCHAR)
             |      FROM documents)),
             |n AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
             |    CAST(sum(length(v)) AS BIGINT) AS plain_bytes
             |  FROM d GROUP BY 1),
             |r AS (SELECT a.col_name,
             |    CAST(sum(CASE WHEN b.v IS NULL OR a.v <> b.v
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
             |  FROM d a LEFT JOIN d b ON a.col_name = b.col_name
             |    AND a.doc_id = b.doc_id + 1
             |  GROUP BY 1)
             |SELECT col_name, n_rows, n_distinct, n_runs, plain_bytes,
             |  CASE WHEN n_distinct * 16 <= n_rows THEN 'DICT'
             |    WHEN n_runs * 4 <= n_rows THEN 'RLE'
             |    ELSE 'PLAIN' END AS encoding
             |FROM n JOIN r USING (col_name)""".stripMargin))
  )
}
