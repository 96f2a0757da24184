package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted trigram index — the pg_trgm GIN-index shape
  * (ref: migrations/1616176828:3 creates `gin(name gin_trgm_ops)`)
  * re-expressed as a posting table.
  *
  * [[build]] materializes `(gram, key…, n_grams)` posting rows once;
  * [[search]] probes them with the query's trigram set: a semi-join on
  * gram + one count aggregation computes |A∩B| per key, so query cost
  * is the probe grams' posting lists — not a full scan of every name.
  * At 100 TB the posting table is written bucketed by gram and the
  * probe is a broadcast of a few dozen grams; the full-scan form (q49's
  * original) reads every row per query.
  *
  * Similarity is pg_trgm's set Jaccard: |A∩B| / (|A| + |B| - |A∩B|) —
  * identical numbers to `array_intersect` on the trigram sets, since
  * postings are distinct per (key, gram).
  */
object TrigramIndex {

  /** Distinct padded lowercase trigrams of a string column — pg_trgm's
    * "  word " padding. The padded string must be materialized as its
    * own column BEFORE calling this (the lambda indexes it per element;
    * an inlined expression would re-evaluate per trigram).
    */
  def trigramsOfPadded(padded: Column): Column =
    array_distinct(transform(sequence(lit(1), length(padded) - 2),
      i => padded.substr(i, lit(3))))

  def padded(s: Column): Column = concat(lit("  "), lower(s), lit(" "))

  /** Posting table: one row per (key…, gram), plus the key's total
    * distinct-gram count (needed for the Jaccard denominator at search
    * time without revisiting the source row).
    */
  def build(df: DataFrame, nameCol: String, keyCols: String*): DataFrame = {
    val keys = keyCols.map(col)
    // outer explode + null-filter on the GENERATED column: a non-outer
    // explode of the `g` attribute makes InferFiltersFromGenerate add
    // `size(g) > 0` which PushDownPredicates inlines through both
    // projections — the full trigram transform then re-runs inside a
    // pre-projection filter with `padded` re-evaluated per element
    // (the DupSpans.gramPositions finding; plan-verified on q49)
    // n_grams wears a coalesce so the column is NON-NULLABLE: the
    // search-time Jaccard comparison otherwise null-rejects it, and the
    // inferred isnotnull(n_grams) pushes down as one more full
    // transform evaluation per row. Value-identical — every row
    // surviving the gram null-filter has a non-null g.
    df.select(keys :+ padded(col(nameCol)).as("p"): _*)
      .select(keys :+ trigramsOfPadded(col("p")).as("g"): _*)
      .select(keys ++ Seq(coalesce(size(col("g")), lit(0)).as("n_grams"),
        explode_outer(col("g")).as("gram")): _*)
      .filter(col("gram").isNotNull)
  }

  /** Probe the posting table: keys sharing >= 1 gram with the probe,
    * scored by set Jaccard, filtered at `threshold`.
    */
  def search(index: DataFrame, probe: String, threshold: Double,
             keyCols: String*): DataFrame = {
    val grams = ("  " + probe.toLowerCase + " ").sliding(3).toSeq.distinct
    val keys = keyCols.map(col)
    index.filter(col("gram").isin(grams.map(x => x: Any): _*))
      .groupBy(keys :+ col("n_grams"): _*)
      .agg(count(lit(1)).as("inter"))
      .select(keys :+
        (col("inter").cast("double") /
          (col("n_grams") + lit(grams.size) - col("inter")).cast("double"))
          .as("sim"): _*)
      .filter(col("sim") > threshold)
  }
}
