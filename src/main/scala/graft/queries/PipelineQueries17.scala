package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.{Dedup, ShardAssign}
import graft.ops.VectorSearch.{dot, toDouble}
import org.apache.spark.sql.functions._

/** Seventeenth pipeline group — placement and representation QA:
  *
  *  - q179: dedup locality — of the near-dup pairs (q25's geometry),
  *    how many land WITHIN one q97 token-balanced shard vs across
  *    shards. This is the planning number behind "can dedup run
  *    shard-local?": within_milli near 1000 means a per-shard pass
  *    catches almost everything and the global shuffle can be skipped
  *    (or run rarely); near 0 means hash sharding scatters dup
  *    families and dedup must stay global. Dup families are CONTENT
  *    clusters while shards are token-balanced hash order, so the
  *    expected answer is "scattered" — the audit proves it rather
  *    than assumes it.
  *  - q180: embedding energy-by-prefix — per truncation width d, the
  *    share of each vector's norm that survives keeping only the
  *    first d dimensions (‖v[:d]‖/‖v‖, exactly the cosine between v
  *    and its truncation). The Matryoshka-style audit run before
  *    shipping truncated embeddings to a cheaper index tier.
  *
  * q179's analytics run on the PAIRS frame (already bounded by the
  * LSH geometry) joined twice against the O(corpus) assignment —
  * equi joins on doc id; q180 is one scan with three codegen'd dot
  * products per row and a 3-row aggregate.
  */
object PipelineQueries17 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** q181's late-bound oracle: the unrolled per-language train chains
    * need the language inventory as literals (data-derived plan-time
    * constants, the q30 centroid pattern — the TRAINING is still fully
    * replayed, nothing of the result is echoed).
    */
  private object PerLangOracle {
    @volatile var sql: Option[String] = None
  }

  private def perlangBpeOracleSql(langs: Seq[String], k: Int): String = {
    val toksFrag = "list_filter(string_split(p, ' '), x -> x != '')"
    val pairsFrag = "CASE WHEN len(toks) >= 2 THEN " +
      "list_transform(generate_series(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1]) ELSE [] END"
    val blocks = langs.zipWithIndex.map { case (l, j) =>
      val lit = l.replace("'", "''")
      val stages = (1 to k).map { i =>
        s"""c${j}_$i AS (SELECT pair, count(*) AS cnt FROM (
           |  SELECT unnest($pairsFrag) AS pair FROM (
           |    SELECT $toksFrag AS toks FROM t${j}_${i - 1}) x) y
           |  GROUP BY pair),
           |m${j}_$i AS (SELECT $i AS iter, pair, cnt FROM c${j}_$i
           |        ORDER BY cnt DESC, pair ASC LIMIT 1),
           |t${j}_$i AS (SELECT replace(p,
           |    ' ' || (SELECT replace(pair, ' ', '  ') FROM m${j}_$i)
           |      || ' ',
           |    ' ' || (SELECT replace(pair, ' ', chr(31)) FROM m${j}_$i)
           |      || ' ') AS p
           |  FROM t${j}_${i - 1})""".stripMargin
      }.mkString(",\n")
      // plain concatenation — the stage strings are already
      // margin-stripped, and a second stripMargin would eat one pipe
      // of every line-leading `||` concat operator
      s"t${j}_0 AS (SELECT ' ' || array_to_string($toksSql, '  ') || ' '" +
        s"\n  AS p FROM documents WHERE lang = '$lit'),\n" + stages
    }.mkString(",\n")
    val unions = langs.zipWithIndex.flatMap { case (l, j) =>
      val lit = l.replace("'", "''")
      (1 to k).map(i =>
        s"SELECT '$lit' AS lang, iter, pair, cnt, " +
          s"replace(pair, ' ', chr(31)) AS merged FROM m${j}_$i")
    }.mkString("\nUNION ALL\n")
    s"WITH $blocks\n$unions"
  }

  val defs: Seq[QDef] = Seq(

    QDef("q179_dedup_locality",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.nearDupMinhashArtifact(docs, "doc_id", "text",
          fpKey = s"$dir#documents#id_text")
        val asg = ShardAssign.tokenBalanced(docs, nShards = 64)
          .select(col("doc_id"), col("shard_id"))
          .localCheckpoint() // joined for both pair endpoints
        pairs
          .join(asg.select(col("doc_id").as("doc_a"),
            col("shard_id").as("sh_a")), "doc_a")
          .join(asg.select(col("doc_id").as("doc_b"),
            col("shard_id").as("sh_b")), "doc_b")
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("sh_a") === col("sh_b")).cast("long"))
              .as("n_within"))
          .select(col("n_pairs"), col("n_within"),
            (col("n_pairs") - col("n_within")).as("n_cross"),
            expr("(1000 * n_within) div greatest(n_pairs, 1)")
              .as("within_milli"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |s AS (
              |  SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${hashSql("g")})) AS sh
              |  FROM t),
              |p AS (
              |  SELECT a.doc_id AS da, b.doc_id AS db
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh)
              |        - len(list_intersect(a.sh, b.sh))) >= 0.8),
              |d AS (SELECT doc_id,
              |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
              |    ${hashSql("'shard:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |tot AS (SELECT sum(n_tokens) AS total FROM d),
              |c AS (SELECT doc_id,
              |    coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |      AS prev
              |  FROM d),
              |a AS (SELECT doc_id,
              |    CAST(prev // greatest(tot.total // 64, 1) AS BIGINT)
              |      AS shard_id
              |  FROM c CROSS JOIN tot),
              |j AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              |    CAST(sum(CASE WHEN sa.shard_id = sb.shard_id
              |      THEN 1 ELSE 0 END) AS BIGINT) AS n_within
              |  FROM p JOIN a sa ON sa.doc_id = p.da
              |         JOIN a sb ON sb.doc_id = p.db)
              |SELECT n_pairs, n_within,
              |  CAST(n_pairs - n_within AS BIGINT) AS n_cross,
              |  CAST((1000 * n_within) // greatest(n_pairs, 1) AS BIGINT)
              |    AS within_milli
              |FROM j""".stripMargin)),

    // Energy-by-prefix: ratio_milli = floor(1000·‖v[:d]‖/‖v‖) per
    // (vector, d) — the division runs on raw ascending-fold doubles
    // (identical in both engines), the floor lands on integers, and
    // the per-d aggregation is exact integer arithmetic. Zero vectors
    // are excluded in both engines (no defined direction).
    QDef("q180_embedding_energy_prefix",
      (s, dir) => {
        val v = toDouble(col("embedding"))
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), v.as("v"))
          .filter(dot(col("v"), col("v")) > 0.0)
          .select(col("vec_id"), col("v"),
            explode(typedLit(Seq(8, 16, 32))).as("d"))
          .select(col("d"),
            floor(lit(1000.0) * sqrt(
              dot(slice(col("v"), lit(1), col("d")),
                slice(col("v"), lit(1), col("d"))) /
                dot(col("v"), col("v"))))
              .cast("long").as("ratio_milli"))
        e.groupBy("d")
          .agg(count(lit(1)).as("n"), sum("ratio_milli").as("sr"),
            min("ratio_milli").as("min_ratio_milli"))
          .select(col("d").cast("long").as("d"), col("n"),
            expr("sr div n").as("mean_ratio_milli"),
            col("min_ratio_milli"))
      },
      Some {
        val vSql = "list_transform(embedding, x -> x::DOUBLE)"
        def dotS(a: String, b: String) = VectorOracleSql.dot(a, b)
        val vd = "list_slice(v, 1, d)"
        s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings
           |  WHERE ${dotS(vSql, vSql)} > 0.0),
           |x AS (SELECT vec_id, v,
           |    CAST(unnest([8, 16, 32]) AS INT) AS d FROM e),
           |r AS (SELECT d,
           |    CAST(floor(1000.0 * sqrt(
           |      ${dotS(vd, vd)} / ${dotS("v", "v")})) AS BIGINT)
           |      AS ratio_milli
           |  FROM x),
           |g AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(ratio_milli) AS BIGINT) AS sr,
           |    CAST(min(ratio_milli) AS BIGINT) AS min_ratio_milli
           |  FROM r GROUP BY 1)
           |SELECT CAST(d AS BIGINT) AS d, n, sr // n AS mean_ratio_milli,
           |  min_ratio_milli
           |FROM g""".stripMargin
      }),

    // Per-language BPE training — the multilingual reality: one
    // tokenizer per language, trained only on that language's corpus
    // (a shared tokenizer over-merges the dominant language and
    // starves the rest). The language inventory is a bounded collect
    // (the CC-gate justification: it is O(10²) in any real corpus);
    // each language then runs q99's bounded-collect loop on its
    // filtered slice — total corpus work ≈ k passes over the corpus
    // regardless of |L|, since the slices partition it. Driver state
    // is |L|·k single rows. The oracle replays every language's full
    // train loop with the inventory as literals (nothing echoed).
    QDef("q181_perlang_bpe",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
          .select(col("lang"), col("text"))
          .localCheckpoint() // |L| filtered trains share one scan
        val langs = docs.select(col("lang")).distinct()
          .orderBy("lang").collect().map(_.getString(0)).toSeq
        PerLangOracle.sql = Some(perlangBpeOracleSql(langs, k = 2))
        // per-language trains are independent driver-round loops over
        // disjoint slices of one checkpointed scan — concurrent, so
        // the wall cost is the slowest language, not the sum (result
        // order preserved by Par.run). Pool CAPPED at 8: langs.size is
        // data-dependent, and one thread per distinct language (each
        // driving its own sequence of driver rounds + checkpoints)
        // would flood the scheduler on a many-language corpus
        graft.ops.Par.run(langs, math.min(langs.size, 8)) { l =>
          graft.ops.BpeTrainer
            .train(docs.filter(col("lang") === l), "text", k = 2)
            .map(m => (l, m.iter, m.pair, m.cnt, m.merged))
        }.flatten.toDF("lang", "iter", "pair", "cnt", "merged")
      },
      None,
      Some(() => PerLangOracle.sql)),

    // PQ reconstruction-error audit: per subspace, the mean/max
    // squared distance between each vector's sub-slice and its
    // assigned codebook centroid — the quantization-loss table that
    // decides whether m=8/k=16 is enough BEFORE the 32× smaller index
    // replaces raw vectors (completes the index-QA family with q165).
    // Codes come from the same codegen'd kernel as q85 (bit-identical
    // assignment); the error fold itself is an interpreted HOF over
    // dsub=8 elements per (row, subspace) — an audit query, not a
    // serving path, and the fold order mirrors the oracle exactly.
    // Per-row errors floor to integer micros so the aggregates are
    // exact.
    QDef("q182_pq_recon_error",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val sample = graft.ops.VectorSearch.sampleVectors(
          emb, "vec_id", "embedding", n = 512, seed = 42)
        val codebook = graft.ops.VectorSearch.pqTrain(
          sample, m = 8, k = 16, iters = 10, seed = 42)
        PqReconOracle.sql = Some(pqReconErrOracleSql(codebook))
        val cbLit = typedLit(codebook.map(_.map(_.toSeq).toSeq).toSeq)
        val dsub = codebook(0)(0).length
        emb.select(toDouble(col("embedding")).as("v"))
          .select(col("v"), posexplode(
            graft.ops.VectorSearch.pqEncodeKernel(col("v"), codebook))
            .as(Seq("mi", "code")))
          .select(col("mi").cast("long").as("subspace"),
            floor(lit(1000000.0) * aggregate(
              zip_with(
                slice(col("v"), col("mi") * dsub + 1, lit(dsub)),
                element_at(element_at(cbLit, col("mi") + 1),
                  col("code") + 1),
                (x, c) => (x - c) * (x - c)),
              lit(0.0), (acc, t) => acc + t)).cast("long")
              .as("err_micro"))
          .groupBy("subspace")
          .agg(count(lit(1)).as("n"), sum("err_micro").as("se"),
            max("err_micro").as("max_err_micro"))
          .select(col("subspace"), col("n"),
            expr("se div n").as("mean_err_micro"),
            col("max_err_micro"))
      },
      None,
      Some(() => PqReconOracle.sql))
  )

  /** q182's late-bound oracle (codebook literals, the q85 pattern). */
  private object PqReconOracle {
    @volatile var sql: Option[String] = None
  }

  private def dblR(x: Double): String = VectorOracleSql.dbl(x)

  private def pqReconErrOracleSql(
      codebook: Array[Array[Array[Double]]]): String = {
    val vSql = "list_transform(embedding, x -> x::DOUBLE)"
    val dsub = codebook(0)(0).length
    // code assignment replayed with the exact q85 expression tree
    def encSql(mi: Int): String = {
      val cells = codebook(mi).zipWithIndex.map { case (cvec, ci) =>
        val dotVc = cvec.zipWithIndex.map { case (cv, di) =>
          s"v[${mi * dsub + di + 1}] * ${dblR(cv)}"
        }.mkString("(", " + ", ")")
        val cn2 = cvec.foldLeft(0.0)((s, x) => s + x * x)
        s"{'d': (${dblR(cn2)} + (-2.0e0 * $dotVc)), 'c': $ci}"
      }.mkString("[", ", ", "]")
      s"(list_sort($cells)[1]).c"
    }
    val blocks = codebook.indices.map { mi =>
      val cents = codebook(mi)
        .map(_.map(dblR).mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      val sliceV = s"list_slice(v, ${mi * dsub + 1}, ${mi * dsub + dsub})"
      s"""SELECT $mi AS subspace,
         |  CAST(floor(1000000.0 * list_reduce(
         |    list_prepend(0.0::DOUBLE, list_transform(
         |      list_zip($sliceV, ($cents)[${encSql(mi)} + 1]),
         |      x -> (x[1] - x[2]) * (x[1] - x[2]))),
         |    (p, q) -> p + q)) AS BIGINT) AS err_micro
         |FROM e""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT $vSql AS v FROM embeddings),
       |u AS (
       |$blocks
       |)
       |SELECT CAST(subspace AS BIGINT) AS subspace,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(err_micro) AS BIGINT) // count(*) AS mean_err_micro,
       |  CAST(max(err_micro) AS BIGINT) AS max_err_micro
       |FROM u GROUP BY subspace""".stripMargin
  }
}
