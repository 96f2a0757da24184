package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Column names must match exactly — the driver
  * sorts columns by name before hashing values.
  *
  * `oracleLate` is for oracles whose SQL embeds values computed by the
  * query run itself (e.g. q30's k-means centroids become literals, the
  * way q31 embeds its hyperplane matrix): Verify dumps oracle_sql.json
  * AFTER running every query, so the thunk sees the populated state.
  * When the thunk yields None the driver records the weaker rows-only
  * check — the same degradation as a missing oracle.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleLate: Option[() => Option[String]] = None)

object QDef {
  /** The oracle map, resolving late-bound oracles at call time. */
  def oracleMap(defs: Seq[QDef]): Map[String, String] =
    defs.flatMap(d =>
      d.oracle.orElse(d.oracleLate.flatMap(f => f())).map(d.name -> _)).toMap
}
