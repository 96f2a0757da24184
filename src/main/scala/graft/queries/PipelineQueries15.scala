package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.BpeTrainer.adjacentPairs
import org.apache.spark.sql.functions._

/** Fifteenth pipeline group — distributional profile statistics:
  *
  *  - q174: corpus entropy rate — unigram entropy H1, bigram entropy
  *    H2, and the conditional rate H2−H1 (≈ H(w₂|w₁)) in milli-nats.
  *    The one-row information profile that tracks corpus "richness"
  *    across snapshots: dedup raises it, template spam lowers it.
  *  - q175: event burstiness — per event-type Fano factor
  *    (variance/mean of hourly counts, observed hours). Fano ≈ 1 is
  *    Poisson traffic; ≫ 1 flags bursty/incident-driven types the
  *    ingest autoscaler must plan for. Complements q146's
  *    autocorrelation with a magnitude (not lag) view.
  *  - q176: quality-signal correlation — per-language exact-integer
  *    Pearson between q164's two ensemble members (token length,
  *    char entropy). The redundancy check BEFORE ensembling: two
  *    signals correlated at 0.9 are one signal counted twice.
  *
  * Integer discipline as established: entropy terms are per-term
  * floored milli-nats (order-free integer sums); Fano reduces to one
  * integer division over exact hourly moments; Pearson's sums are
  * exact longs with ONE mirrored float sqrt/divide at the end (the
  * q146 construction).
  */
object PipelineQueries15 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  /** floor(1000·ln n) − (Σfloor(1000·c·ln c)) div n over a count
    * column aggregate — the shared quantized-entropy form.
    */
  private def entSql(n: String, sterm: String): String =
    s"CAST(CAST(floor(1000.0 * ln(($n)::DOUBLE)) AS BIGINT) - " +
      s"(($sterm) // ($n)) AS BIGINT)"

  val defs: Seq[QDef] = Seq(

    // Corpus entropy rate: both gram streams collapse in one
    // aggregation each (map-side combined), the entropy arithmetic
    // runs on two scalar rows. h1/h2 use the q160 quantization so
    // the numbers are comparable across the operator family.
    QDef("q174_ngram_entropy_rate",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"))
          .localCheckpoint() // unigram + bigram streams share it
        def ent(grams: org.apache.spark.sql.DataFrame, out: String) =
          grams.groupBy("g").agg(count(lit(1)).as("c"))
            .agg(sum("c").as("n"), count(lit(1)).as("k"),
              sum(floor(lit(1000.0) * col("c").cast("double") *
                log(col("c").cast("double"))).cast("long")).as("sterm"))
            .select(col("n").as(s"n_$out"), col("k").as(s"k_$out"),
              (floor(lit(1000.0) * log(col("n").cast("double")))
                .cast("long") - expr("sterm div n")).as(s"h_$out"))
        val u = ent(t.select(explode(col("toks")).as("g")), "uni")
        val b = ent(t.select(explode(adjacentPairs(col("toks"))).as("g")),
          "bi")
        u.crossJoin(broadcast(b))
          .select(col("n_uni"), col("k_uni"), col("h_uni"),
            col("n_bi"), col("k_bi"), col("h_bi"),
            (col("h_bi") - col("h_uni")).as("h_rate"))
      },
      Some(s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
              |ug AS (SELECT unnest(toks) AS g FROM t),
              |uc AS (SELECT g, count(*) AS c FROM ug GROUP BY 1),
              |ua AS (SELECT CAST(sum(c) AS BIGINT) AS n,
              |    CAST(count(*) AS BIGINT) AS k,
              |    CAST(sum(CAST(floor(1000.0 * c::DOUBLE * ln(c::DOUBLE))
              |      AS BIGINT)) AS BIGINT) AS sterm FROM uc),
              |bg AS (SELECT unnest(CASE WHEN len(toks) >= 2 THEN
              |    list_transform(generate_series(1, len(toks) - 1),
              |      i -> toks[i] || ' ' || toks[i+1])
              |    ELSE [] END) AS g FROM t),
              |bc AS (SELECT g, count(*) AS c FROM bg GROUP BY 1),
              |ba AS (SELECT CAST(sum(c) AS BIGINT) AS n,
              |    CAST(count(*) AS BIGINT) AS k,
              |    CAST(sum(CAST(floor(1000.0 * c::DOUBLE * ln(c::DOUBLE))
              |      AS BIGINT)) AS BIGINT) AS sterm FROM bc)
              |SELECT ua.n AS n_uni, ua.k AS k_uni,
              |  ${entSql("ua.n", "ua.sterm")} AS h_uni,
              |  ba.n AS n_bi, ba.k AS k_bi,
              |  ${entSql("ba.n", "ba.sterm")} AS h_bi,
              |  ${entSql("ba.n", "ba.sterm")} -
              |    ${entSql("ua.n", "ua.sterm")} AS h_rate
              |FROM ua CROSS JOIN ba""".stripMargin)),

    // Event burstiness: hourly counts per type (ONE corpus
    // aggregation, O(#types · #hours) rows after), then exact integer
    // moments over each type's observed hours and
    // fano_milli = (1000·Σd²) div (n_hours · mean) with the floored
    // integer mean — engine-identical, no float anywhere.
    QDef("q175_event_fano",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .groupBy("event_type", "h").agg(count(lit(1)).as("c"))
          .localCheckpoint() // mean pass + deviation pass share it
        val m = hourly.groupBy("event_type")
          .agg(count(lit(1)).as("nh"), sum("c").as("ne"))
          .withColumn("mean_c", expr("ne div nh"))
        hourly.join(broadcast(m), "event_type")
          .withColumn("d", col("c") - col("mean_c"))
          .groupBy("event_type")
          .agg(max("nh").as("n_hours"), max("ne").as("n_events"),
            sum(col("d") * col("d")).as("devsq"))
          .join(broadcast(m.select(col("event_type"), col("mean_c"))),
            "event_type")
          .select(col("event_type"), col("n_hours"), col("n_events"),
            expr("(1000 * devsq) div (n_hours * greatest(mean_c, 1))")
              .as("fano_milli"))
      },
      Some("""WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS h,
             |    count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nh,
             |    CAST(sum(c) AS BIGINT) AS ne
             |  FROM hc GROUP BY 1),
             |m2 AS (SELECT event_type, nh, ne, ne // nh AS mean_c FROM m),
             |dv AS (SELECT hc.event_type, hc.c - m2.mean_c AS d
             |  FROM hc JOIN m2 USING (event_type)),
             |ds AS (SELECT event_type, CAST(sum(d * d) AS BIGINT)
             |    AS devsq
             |  FROM dv GROUP BY 1)
             |SELECT m2.event_type, m2.nh AS n_hours, m2.ne AS n_events,
             |  CAST((1000 * ds.devsq) // (m2.nh * greatest(m2.mean_c, 1))
             |    AS BIGINT) AS fano_milli
             |FROM ds JOIN m2 USING (event_type)""".stripMargin)),

    // Quality-signal Pearson per language: exact integer sums (n, Σx,
    // Σy, Σxy, Σx², Σy²) in ONE aggregation over the kernel-scanned
    // doc stream; r_milli = floor(1000·num/sqrt(dx·dy)) with num and
    // the two variance terms exact longs and dx·dy computed as a
    // DOUBLE product of two exactly-converted longs (the q146 rule —
    // the product can pass 2⁵³, the factors cannot).
    QDef("q176_signal_correlation",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = docs.filter(length(col("text")) >= 1)
          .select(col("lang"),
            size(tokens(col("text"))).cast("long").as("x"),
            org.apache.spark.sql.GraftExpr.column(
              graft.expressions.CharEntropyTerms(
                org.apache.spark.sql.GraftExpr.expression(col("text"))))
              .as("t"))
          .select(col("lang"), col("x"),
            (floor(lit(1000.0) * log(col("t.n").cast("double")))
              .cast("long") - expr("t.sterm div t.n")).as("y"))
        base.groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          // degenerate-variance guard (the q146 rule): a constant
          // signal has no defined correlation — Spark would emit NULL
          // while DuckDB's IEEE floats reach inf/NaN, so both engines
          // must drop the row rather than divide
          .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
            col("n") * col("syy") - col("sy") * col("sy") > 0)
          .select(col("lang"), col("n"),
            floor(lit(1000.0) *
              ((col("n") * col("sxy") - col("sx") * col("sy"))
                .cast("double") /
                sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                  .cast("double") *
                  (col("n") * col("syy") - col("sy") * col("sy"))
                    .cast("double"))))
              .cast("long").as("r_milli"))
      },
      Some(s"""WITH ch AS (SELECT doc_id, unnest(list_transform(
              |    generate_series(1, len(text)), i -> substr(text, i, 1)))
              |    AS ch
              |  FROM documents WHERE len(text) >= 1),
              |cc AS (SELECT doc_id, ch, count(*) AS c
              |  FROM ch GROUP BY 1, 2),
              |ce AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
              |    CAST(sum(CAST(floor(1000.0 * c::DOUBLE * ln(c::DOUBLE))
              |      AS BIGINT)) AS BIGINT) AS sterm
              |  FROM cc GROUP BY 1),
              |b AS (SELECT d.lang,
              |    CAST(len($toksSql) AS BIGINT) AS x,
              |    ${entSql("ce.n", "ce.sterm")} AS y
              |  FROM documents d JOIN ce ON d.doc_id = ce.doc_id),
              |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(x) AS BIGINT) AS sx,
              |    CAST(sum(y) AS BIGINT) AS sy,
              |    CAST(sum(x * y) AS BIGINT) AS sxy,
              |    CAST(sum(x * x) AS BIGINT) AS sxx,
              |    CAST(sum(y * y) AS BIGINT) AS syy
              |  FROM b GROUP BY 1
              |  HAVING count(*) * sum(x * x) - sum(x) * sum(x) > 0
              |     AND count(*) * sum(y * y) - sum(y) * sum(y) > 0)
              |SELECT lang, n,
              |  CAST(floor(1000.0 *
              |    ((n * sxy - sx * sy)::DOUBLE /
              |     sqrt((n * sxx - sx * sx)::DOUBLE *
              |          (n * syy - sy * sy)::DOUBLE))) AS BIGINT)
              |    AS r_milli
              |FROM g""".stripMargin))
  )
}
