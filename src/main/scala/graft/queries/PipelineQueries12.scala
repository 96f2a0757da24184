package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.{BpeTrainer, WordPieceTrainer}
import graft.ops.VectorSearch._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twelfth pipeline group — index health, sequence modeling, vector
  * QA, and tokenizer evaluation:
  *
  *  - q165: IVF posting-list balance audit — the Gini coefficient and
  *    max-cell share of the q30 index's cell sizes. A skewed IVF
  *    (one mega-cell) loses both recall (probes waste on one list)
  *    and latency (the hot list dominates every query); this is the
  *    "index health" table an operator checks before serving.
  *  - q166: per-user event-type transition matrix (first-order Markov
  *    chain over the events stream) with integer milli probabilities —
  *    behavioral sequence statistics.
  *  - q167: embedding-norm QA outliers — per-label z-scores of the
  *    squared L2 norm (micro-quantized). Degenerate vectors (zeros,
  *    un-normalized rows, fp blowups) surface as norm outliers before
  *    they poison ANN training; the q159 integer-moment discipline.
  *  - q168: tokenizer shoot-out — BPE (q99) vs WordPiece (q163)
  *    trained on the SAME 90% hash split, compression measured on the
  *    held-out val split: tokens-after/tokens-before per family. The
  *    eval that justifies choosing one tokenizer family over the
  *    other; oracle replays both trains AND both applies end to end.
  *
  * Scale notes: q165's windows run over O(k) cells; q166's only
  * corpus-scale op is the per-user lag window (bounded by per-user
  * activity, the q18 sessionization contract — salt the rare whale
  * user at 100 TB); q167 is scan + vocabulary-free aggregation;
  * q168's corpus work is 2k bounded-collect training rounds on the
  * 90% split and one apply scan of the 5% split per family.
  */
object PipelineQueries12 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** Shortest-safe double literal (DOUBLE-parsing exponent form). */
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  // lockstep with VectorQueries' vector fragments
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSql(a: String): String = VectorOracleSql.norm(a)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  /** q165's late-bound oracle: assignment replay needs the run-trained
    * centroids as literals (the q30 pattern).
    */
  private object IvfBalanceOracle {
    @volatile var sql: Option[String] = None
  }

  /** Exact FLOOR division for possibly-negative numerators (the shared
    * canonical-remainder idiom).
    */
  private def fdiv(s: Column, n: Column): Column =
    ((s - ((s % n) + n) % n) / n).cast("long")

  private def fdivSql(s: String, n: String): String =
    s"(($s) - ((($s) % ($n)) + ($n)) % ($n)) // ($n)"

  val defs: Seq[QDef] = Seq(

    // IVF posting-balance: assign every vector to its PRIMARY cell
    // (probes=1) under the q30 centroids (same seeded sample + driver
    // k-means → bit-identical cells), histogram the cells, and report
    // the classical inequality summary: Gini over the sorted cell
    // sizes plus the max cell. Everything after the one assignment
    // scan runs on O(k) rows — the rank window orders ≤ k cells.
    QDef("q165_ivf_balance",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val centroids = kmeansCentroids(sample, k = 16, iters = 10,
          seed = 42)
        IvfBalanceOracle.sql = Some {
          def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
          val cells = centroids.zipWithIndex.map { case (c, i) =>
            val n = dbl(math.sqrt(c.map(x => x * x).sum))
            s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), " +
              s"'cell': $i}"
          }.mkString("[", ",\n", "]")
          s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
             |a AS (SELECT vec_id, list_reverse_sort($cells)[1].cell
             |    AS cell FROM e),
             |g AS (SELECT cell, count(*) AS c FROM a GROUP BY 1),
             |r AS (SELECT cell, c,
             |    row_number() OVER (ORDER BY c, cell) AS r FROM g),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
             |    CAST(sum(c) AS BIGINT) AS n_vecs,
             |    CAST(max(c) AS BIGINT) AS max_cell,
             |    CAST(sum(r * c) AS BIGINT) AS rc FROM r)
             |SELECT n_cells, n_vecs, max_cell,
             |  CAST((1000 * (2 * rc - (n_cells + 1) * n_vecs))
             |    // (n_cells * n_vecs) AS BIGINT) AS gini_milli
             |FROM s""".stripMargin
        }
        val assign = ivfAssign(emb, "vec_id", "embedding", centroids,
          probes = 1)
        val cells = assign.groupBy("cell").agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("c"), col("cell"))
        cells.withColumn("r", row_number().over(w).cast("long"))
          .agg(count(lit(1)).as("n_cells"), sum("c").as("n_vecs"),
            max("c").as("max_cell"), sum(col("r") * col("c")).as("rc"))
          .select(col("n_cells"), col("n_vecs"), col("max_cell"),
            expr("(1000 * (2 * rc - (n_cells + 1) * n_vecs)) div " +
              "(n_cells * n_vecs)").as("gini_milli"))
      },
      None,
      Some(() => IvfBalanceOracle.sql)),

    // First-order Markov transition matrix over each user's
    // time-ordered event stream: count (type → next type) transitions,
    // normalize per source type to integer milli probabilities. The
    // lag window partitions by user (bounded by per-user activity);
    // the transition table is |types|² rows with the per-source
    // totals broadcast back.
    QDef("q166_markov_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val tr = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("to_type", lead("event_type", 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = tr.groupBy("from_type").agg(sum("n").as("n_from"))
        tr.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            expr("(1000 * n) div n_from").as("p_milli"))
      },
      Some("""WITH t AS (SELECT event_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (SELECT event_type AS from_type, to_type,
             |    count(*) AS n
             |  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
             |  FROM c GROUP BY 1)
             |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
             |  CAST((1000 * n) // n_from AS BIGINT) AS p_milli
             |FROM c JOIN f USING (from_type)""".stripMargin)),

    // Embedding-norm QA: per-label z-scores of the micro-quantized
    // squared L2 norm. nsq_micro is floored per row (the only float
    // op is the codegen'd ascending-fold dot product, mirrored by the
    // oracle's list_reduce fold), so per-label moments are exact
    // integer sums; z uses the canonical-remainder floor division.
    QDef("q167_embedding_norm_audit",
      (s, dir) => {
        val base = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            floor(lit(1000000.0) * dot(toDouble(col("embedding")),
              toDouble(col("embedding")))).cast("long").as("nsq_micro"))
          .localCheckpoint() // moments + the z pass share it
        val mom = base.groupBy("label")
          .agg(count(lit(1)).as("n"), sum("nsq_micro").as("sx"))
          .withColumn("mean_x", expr("sx div n"))
        val dev = base.join(broadcast(mom), "label")
          .withColumn("d", col("nsq_micro") - col("mean_x"))
        val std = dev.groupBy("label")
          .agg(sum(col("d") * col("d")).as("devsq"), max("n").as("n2"))
          .withColumn("std_x",
            floor(sqrt(expr("devsq div n2").cast("double"))).cast("long"))
        dev.join(broadcast(std), "label")
          .withColumn("z_centi", fdiv(lit(100L) * col("d"),
            greatest(col("std_x"), lit(1L))))
          .select(col("vec_id"), col("label"), col("nsq_micro"),
            col("z_centi"),
            (abs(col("z_centi")) >= 250L).cast("long").as("outlier"))
      },
      Some(s"""WITH b AS (SELECT vec_id, label,
              |    CAST(floor(1000000.0 * ${dotSql(vSql, vSql)})
              |      AS BIGINT) AS nsq_micro
              |  FROM embeddings),
              |mo AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(nsq_micro) AS BIGINT) AS sx
              |  FROM b GROUP BY 1),
              |mm AS (SELECT label, n, sx // n AS mean_x FROM mo),
              |dv AS (SELECT b.vec_id, b.label, b.nsq_micro,
              |    b.nsq_micro - mm.mean_x AS d, mm.n
              |  FROM b JOIN mm USING (label)),
              |sd AS (SELECT label,
              |    CAST(floor(sqrt(((CAST(sum(d*d) AS BIGINT)) // max(n))
              |      ::DOUBLE)) AS BIGINT) AS std_x
              |  FROM dv GROUP BY 1)
              |SELECT dv.vec_id, dv.label, dv.nsq_micro,
              |  CAST(${fdivSql("100 * dv.d", "greatest(sd.std_x, 1)")}
              |    AS BIGINT) AS z_centi,
              |  CAST(CASE WHEN abs(${fdivSql("100 * dv.d",
                   "greatest(sd.std_x, 1)")}) >= 250
              |    THEN 1 ELSE 0 END AS BIGINT) AS outlier
              |FROM dv JOIN sd USING (label)""".stripMargin)),

    // Tokenizer shoot-out: train BPE and WordPiece (k=3 each) on the
    // 90% hash split, then measure each family's compression on the
    // UNSEEN 5% val split — merged-tokens/raw-tokens in milli. Val
    // compression (not train) is the honest number: a tokenizer that
    // memorizes its training corpus's quirks shows up here. Oracle
    // replays both train loops and both val applies bit-identically.
    QDef("q168_tokenizer_compare",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("text"),
            (tokenHash(concat(lit("tok:"), col("doc_id").cast("string")))
              % 20).as("b"))
          .localCheckpoint() // both trains + the val applies share it
        val train = t.filter(col("b") < 18).select(col("text"))
        val valToks = t.filter(col("b") === 18)
          .select(tokens(col("text")).as("toks"))
          .localCheckpoint() // two apply scans share it
        // the two train loops are independent driver-round sequences
        // over the same (checkpointed) split — run them concurrently
        // so the wall cost is the slower family, not the sum
        val trained = graft.ops.Par.run(Seq("bpe", "wp"), 2) {
          case "bpe" => BpeTrainer.trainArtifact(train, "text", k = 3,
            fpKey = s"$dir#documents#text#b_lt18")
          case _ => WordPieceTrainer.trainArtifact(train, "text", k = 3,
            fpKey = s"$dir#documents#text#b_lt18")
            .map(m => BpeTrainer.Merge(m.iter, m.pair, m.cnt, m.merged))
        }
        val (bpe, wp) = (trained(0), trained(1))
        def comp(family: String, merges: Seq[BpeTrainer.Merge]) =
          valToks.select(size(col("toks")).cast("long").as("nb"),
            size(BpeTrainer.applyMerges(col("toks"), merges))
              .cast("long").as("na"))
            .agg(sum("nb").as("n_raw"), sum("na").as("n_merged"))
            .select(lit(family).as("family"), col("n_raw"),
              col("n_merged"),
              expr("(1000 * n_merged) div n_raw").as("comp_milli"))
        comp("bpe", bpe).unionAll(comp("wordpiece", wp))
      },
      Some(tokenizerCompareOracleSql(3))),
  )

  /** Oracle for q168: unrolled BPE and WordPiece training on the 90%
    * split (the q99/q163 CTE chains over `t0`), each round's replace
    * applied to BOTH the train corpus and the val split, then the val
    * token counts before/after per family.
    */
  private def tokenizerCompareOracleSql(k: Int): String = {
    val toksFrag = "list_filter(string_split(p, ' '), x -> x != '')"
    val pairsFrag = "CASE WHEN len(toks) >= 2 THEN " +
      "list_transform(generate_series(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1]) ELSE [] END"
    def applyStage(m: String, from: String, to: String) =
      s"""$to AS (SELECT replace(p,
         |    ' ' || (SELECT replace(pair, ' ', '  ') FROM $m) || ' ',
         |    ' ' || (SELECT replace(pair, ' ', chr(31)) FROM $m) || ' ')
         |    AS p
         |  FROM $from)""".stripMargin
    val bpeStages = (1 to k).map { i =>
      s"""bc$i AS (SELECT pair, count(*) AS cnt FROM (
         |  SELECT unnest($pairsFrag) AS pair FROM (
         |    SELECT $toksFrag AS toks FROM bt${i - 1}) x) y GROUP BY pair),
         |bm$i AS (SELECT pair FROM bc$i
         |        ORDER BY cnt DESC, pair ASC LIMIT 1),
         |${applyStage(s"bm$i", s"bt${i - 1}", s"bt$i")},
         |${applyStage(s"bm$i", s"bv${i - 1}", s"bv$i")}"""
        .stripMargin
    }.mkString(",\n")
    val wpStages = (1 to k).map { i =>
      s"""wx$i AS (SELECT $toksFrag AS toks FROM wt${i - 1}),
         |wu$i AS (SELECT tok, count(*) AS c FROM (
         |    SELECT unnest(toks) AS tok FROM wx$i) z GROUP BY tok),
         |wc$i AS (SELECT pair, count(*) AS cnt FROM (
         |    SELECT unnest($pairsFrag) AS pair FROM wx$i) y GROUP BY pair),
         |wm$i AS (SELECT pair,
         |        (1000000000 * cnt) // (ua.c * ub.c) AS score_nano
         |        FROM wc$i
         |        JOIN wu$i ua ON ua.tok = split_part(pair, ' ', 1)
         |        JOIN wu$i ub ON ub.tok = split_part(pair, ' ', 2)
         |        ORDER BY score_nano DESC, pair ASC LIMIT 1),
         |${applyStage(s"wm$i", s"wt${i - 1}", s"wt$i")},
         |${applyStage(s"wm$i", s"wv${i - 1}", s"wv$i")}"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT text,
       |    ${hashSql("'tok:' || CAST(doc_id AS VARCHAR)")} % 20 AS b
       |  FROM documents),
       |tr0 AS (SELECT ' ' || array_to_string($toksSql, '  ') || ' '
       |  AS p FROM d WHERE b < 18),
       |va0 AS (SELECT ' ' || array_to_string($toksSql, '  ') || ' '
       |  AS p FROM d WHERE b = 18),
       |bt0 AS (SELECT p FROM tr0), bv0 AS (SELECT p FROM va0),
       |wt0 AS (SELECT p FROM tr0), wv0 AS (SELECT p FROM va0),
       |$bpeStages,
       |$wpStages,
       |raw AS (SELECT CAST(sum(len($toksFrag)) AS BIGINT) AS n_raw
       |  FROM va0),
       |bn AS (SELECT CAST(sum(len($toksFrag)) AS BIGINT) AS n_merged
       |  FROM bv$k),
       |wn AS (SELECT CAST(sum(len($toksFrag)) AS BIGINT) AS n_merged
       |  FROM wv$k)
       |SELECT 'bpe' AS family, raw.n_raw, bn.n_merged,
       |  CAST((1000 * bn.n_merged) // raw.n_raw AS BIGINT) AS comp_milli
       |FROM raw, bn
       |UNION ALL
       |SELECT 'wordpiece' AS family, raw.n_raw, wn.n_merged,
       |  CAST((1000 * wn.n_merged) // raw.n_raw AS BIGINT) AS comp_milli
       |FROM raw, wn""".stripMargin
  }
}
