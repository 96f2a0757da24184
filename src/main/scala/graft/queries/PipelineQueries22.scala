package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.UnigramTrainer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-second pipeline group — the unigram-LM tokenizer family
  * ([[graft.ops.UnigramTrainer]], the SentencePiece algorithm),
  * completing the tokenizer-training trio next to frequency-ranked
  * BPE (q99) and likelihood-ranked WordPiece (q163):
  *
  *  - q212: train — seed pieces (all substrings ≤ 4 chars: every
  *    single char + the 48 highest-frequency multi-char candidates),
  *    integer milli-nat costs, one Viterbi E-step over the
  *    distinct-words table, and the re-estimated top-32 vocabulary by
  *    expected piece count. The corpus is scanned ONCE (word counts);
  *    the lattice DP is MaxWordLen staged vocab-sized joins — no
  *    UDFs, no recursion primitive, and the oracle replays every
  *    stage verbatim.
  *  - q213: apply — per-source fertility (pieces per word) under the
  *    trained segmentation: the word → piece-count map broadcasts
  *    back at the corpus token stream, the same "model small, corpus
  *    passes once" contract as q136's BPE fertility.
  *
  * Determinism: costs floor(1000·ln·) on integers; the DP minimizes
  * the total-ordered (cost, start, piece) struct so each word's path
  * is unique; ranks break ties on the piece string.
  */
object PipelineQueries22 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private val L = UnigramTrainer.MaxWordLen
  private val P = UnigramTrainer.MaxPieceLen
  private val M = UnigramTrainer.SeedMulti

  /** The (word, piece) Viterbi segmentation behind the
    * [[graft.ops.ArtifactStore]] (r12 verdict #1): the L-stage DP is
    * the expensive half of the trainer, and its output is a
    * vocab-sized write-once table — q212 commits it, q213 (and every
    * later sweep over the same corpus) serves the parquet without
    * touching the builder, whose word/piece inputs then never
    * materialize. No root → inline build + checkpoint (est counts +
    * per-word piece counts share it), as before.
    */
  private def segArtifact(s: SparkSession, dir: String)
                         (build: => DataFrame): DataFrame =
    graft.ops.ArtifactStore.root(s) match {
      case None => build.localCheckpoint()
      case Some(_) => graft.ops.ArtifactStore.buildOrServe(
        s, "unigram_segments",
        graft.ops.ArtifactStore.fingerprint(
          Tables.documents(s, dir).select(col("text")),
          s"$dir#documents#text"),
        s"L=$L,P=$P,M=$M", s"$dir#documents#text")(build)
    }

  /** Shared train pipeline: (words, pieces, word → n_pieces). */
  private def train(s: SparkSession, dir: String)
  : (DataFrame, DataFrame, DataFrame) = {
    val words = UnigramTrainer
      .wordCounts(Tables.documents(s, dir), tokens(col("text")))
      .localCheckpoint() // seed freq join + est join + apply share it
    val pieces = UnigramTrainer.seedPieces(words).localCheckpoint()
    // kernel segmentation: one map pass (spec-pinned == staged joins)
    val seg = segArtifact(s, dir)(
      UnigramTrainer.segmentKernel(words, pieces))
    (words, pieces, seg)
  }

  /** q213's serve path: only the segmentation table — on a warm
    * artifact no corpus-side train work runs at all. */
  private def segOnly(s: SparkSession, dir: String): DataFrame =
    segArtifact(s, dir) {
      val words = UnigramTrainer
        .wordCounts(Tables.documents(s, dir), tokens(col("text")))
        .localCheckpoint()
      val pieces = UnigramTrainer.seedPieces(words).localCheckpoint()
      UnigramTrainer.segmentKernel(words, pieces)
    }

  /** The DuckDB replay of the whole trainer: word counts → seed
    * costing → L Viterbi stages → L backtrack stages → `paths`
    * (word, piece) and `pc` (piece, freq, cost). Shared by both
    * oracles.
    */
  private def unigramCtes: String = {
    val dpStages = (1 to L).map { j =>
      s"""dp$j AS MATERIALIZED (SELECT * FROM dp${j - 1} UNION ALL
         |  SELECT word, CAST($j AS BIGINT) AS pos, m.cost AS cost,
         |      m.bi AS bi, m.bp AS bp FROM (
         |    SELECT e.word, min({'cost': d.cost + e.c, 'bi': e.i,
         |        'bp': e.piece}) AS m
         |    FROM e JOIN dp${j - 1} d ON e.word = d.word AND e.i = d.pos
         |    WHERE e.j = $j GROUP BY e.word) x)""".stripMargin
    }.mkString(",\n")
    val btStages = (L - 1 to 1 by -1).map { k =>
      s"""bt$k AS MATERIALIZED (SELECT d.word, d.pos, d.bi, d.bp FROM bt${k + 1} b
         |  JOIN dp$L d ON d.word = b.word AND d.pos = b.bi
         |  WHERE d.pos > 0)""".stripMargin
    }.mkString(",\n")
    val pathUnion = (L to 1 by -1)
      .map(k => s"SELECT word, bp AS piece FROM bt$k")
      .mkString("\n  UNION ALL ")
    s"""w AS MATERIALIZED (SELECT tok AS word, count(*) AS cnt FROM (
       |    SELECT unnest($toksSql) AS tok FROM documents) z
       |  WHERE len(tok) BETWEEN 1 AND $L GROUP BY 1),
       |p1 AS MATERIALIZED (SELECT word, unnest(generate_series(0, len(word) - 1)) AS i
       |  FROM w),
       |sub AS MATERIALIZED (SELECT word, i,
       |    unnest(generate_series(1, least($P, len(word) - i))) AS l
       |  FROM p1),
       |s2 AS MATERIALIZED (SELECT word, i, i + l AS j, substr(word, i + 1, l) AS piece
       |  FROM sub),
       |fr AS MATERIALIZED (SELECT piece, sum(cnt) AS f FROM s2 JOIN w USING (word)
       |  GROUP BY 1),
       |mu AS MATERIALIZED (SELECT piece, f FROM fr WHERE len(piece) >= 2
       |  ORDER BY f DESC, piece LIMIT $M),
       |sel AS MATERIALIZED (SELECT piece, f FROM fr WHERE len(piece) = 1
       |  UNION ALL SELECT piece, f FROM mu),
       |tf AS MATERIALIZED (SELECT sum(f) AS tf FROM sel),
       |pc AS MATERIALIZED (SELECT piece, CAST(f AS BIGINT) AS freq,
       |    CAST(floor(1000.0 * ln(tf.tf::DOUBLE)) AS BIGINT) -
       |    CAST(floor(1000.0 * ln(f::DOUBLE)) AS BIGINT) AS cost
       |  FROM sel, tf),
       |e AS MATERIALIZED (SELECT s2.word, CAST(s2.i AS BIGINT) AS i,
       |    CAST(s2.j AS BIGINT) AS j, s2.piece, pc.cost AS c
       |  FROM s2 JOIN pc USING (piece)),
       |dp0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS pos,
       |    CAST(0 AS BIGINT) AS cost, CAST(-1 AS BIGINT) AS bi,
       |    '' AS bp FROM w),
       |$dpStages,
       |bt$L AS MATERIALIZED (SELECT d.word, d.pos, d.bi, d.bp FROM dp$L d
       |  JOIN w ON d.word = w.word AND d.pos = len(w.word)
       |  WHERE d.pos > 0),
       |$btStages,
       |paths AS ($pathUnion)""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    QDef("q212_unigram_train",
      (s, dir) => {
        val (words, pieces, seg) = train(s, dir)
        val est = seg.join(words, "word")
          .groupBy("piece").agg(sum("cnt").as("est_cnt"))
        est.join(pieces, "piece")
          // rank window runs over the ≤ |pieces| aggregated rows
          .withColumn("rank", row_number().over(
            Window.orderBy(col("est_cnt").desc, col("piece"))))
          .filter(col("rank") <= 32)
          .select(col("rank").cast("long").as("rank"), col("piece"),
            col("freq").as("seed_freq"), col("cost_milli"),
            col("est_cnt"))
      },
      Some(s"""WITH $unigramCtes,
              |est AS MATERIALIZED (SELECT piece, sum(w.cnt) AS est_cnt FROM paths
              |  JOIN w USING (word) GROUP BY 1),
              |r AS (SELECT row_number() OVER (
              |      ORDER BY est_cnt DESC, piece) AS rank,
              |    piece, freq AS seed_freq, cost AS cost_milli, est_cnt
              |  FROM est JOIN pc USING (piece))
              |SELECT CAST(rank AS BIGINT) AS rank, piece,
              |  seed_freq, cost_milli, CAST(est_cnt AS BIGINT) AS est_cnt
              |FROM r WHERE rank <= 32""".stripMargin)),

    QDef("q213_unigram_fertility",
      (s, dir) => {
        val seg = segOnly(s, dir)
        val np = seg.groupBy("word").agg(count(lit(1)).as("np"))
        Tables.documents(s, dir)
          .select(col("source"), explode(tokens(col("text"))).as("word"))
          .join(broadcast(np), "word") // words > MaxWordLen drop out
          .groupBy("source")
          .agg(count(lit(1)).as("n_words"), sum("np").as("n_pieces"))
          .select(col("source"), col("n_words"), col("n_pieces"),
            expr("(1000 * n_pieces) div n_words").as("fertility_milli"))
      },
      Some(s"""WITH $unigramCtes,
              |np AS MATERIALIZED (SELECT word, count(*) AS np FROM paths GROUP BY 1),
              |ts AS (SELECT source, unnest($toksSql) AS word
              |  FROM documents)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
              |  CAST(sum(np.np) AS BIGINT) AS n_pieces,
              |  CAST((1000 * sum(np.np)) // count(*) AS BIGINT)
              |    AS fertility_milli
              |FROM ts JOIN np USING (word) GROUP BY source""".stripMargin))
  )
}
