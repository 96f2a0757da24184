package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Column names must match exactly — the driver
  * sorts columns by name before hashing values.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  /** Collect a set of QDefs into the two SparkEntry maps. */
  def toMaps(defs: Seq[QDef])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) =
    (defs.map(d => d.name -> d.fn).toMap,
     defs.flatMap(d => d.oracle.map(d.name -> _)).toMap)
}
