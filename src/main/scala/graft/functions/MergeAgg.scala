package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** `jsonb_merge_agg` — fold json-object concatenation over a group
  * (ref: migrations/1609356128:4-9: `jsonb_concat` with initcond '{}',
  * i.e. later entries override earlier keys).
  *
  * Postgres folds in table order; Spark aggregation order is partition-
  * dependent, so the input carries an explicit sort key and the buffer
  * holds (key → map) until `finish`, which replays the concatenation in
  * key order — deterministic under any partitioning, same result as the
  * ordered fold.
  */
object MergeAgg {

  /** Input row: (group key — unused, sort key, json object as map). */
  type Row = (Long, String, Map[String, String])

  val jsonbMergeAgg: Aggregator[Row, Map[String, Map[String, String]],
      Map[String, String]] =
    new Aggregator[Row, Map[String, Map[String, String]],
        Map[String, String]] {
      def zero: Map[String, Map[String, String]] = Map.empty
      def reduce(b: Map[String, Map[String, String]], a: Row)
          : Map[String, Map[String, String]] = b + (a._2 -> a._3)
      def merge(b1: Map[String, Map[String, String]],
                b2: Map[String, Map[String, String]])
          : Map[String, Map[String, String]] = b1 ++ b2
      def finish(b: Map[String, Map[String, String]]): Map[String, String] =
        b.toSeq.sortBy(_._1).foldLeft(Map.empty[String, String]) {
          case (acc, (_, m)) => acc ++ m
        }
      def bufferEncoder: Encoder[Map[String, Map[String, String]]] =
        Encoders.kryo[Map[String, Map[String, String]]]
      def outputEncoder: Encoder[Map[String, String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
