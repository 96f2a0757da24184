package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries read through here so scan options stay in one place.
  * The tables are unpartitioned single parquet files at test scale; at
  * production scale the same loaders would point at height/date-partitioned
  * directories and every filter below would prune partitions.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` normalizes to a microsecond TimestampType whatever the
    * driver's parquet writer produced that round:
    *  - TIMESTAMP(NANOS): Spark has no nanosecond timestamp type, so
    *    sessions read it as a long (nanosAsLong, set in Verify/Bench)
    *    and we truncate to µs — the same floor-truncation DuckDB
    *    applies when casting ns → µs.
    *  - TIMESTAMP(isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ,
    *    which unix_micros/watermarks reject; the cast interprets the
    *    wall-clock in the session timezone (pinned to UTC by every
    *    entrypoint), the same instant DuckDB's naive reading yields.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
