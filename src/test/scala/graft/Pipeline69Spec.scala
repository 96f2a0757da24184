package graft

import org.apache.spark.sql.functions._

/** Invariant specs for q355/q356. */
class Pipeline69Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q355: quotas are EXACT per source (train = n·8 div 10, val = " +
    "n div 10, test = remainder) and splits tile each source") {
    val out = SparkEntry.queries("q355_split_manifest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._1)
    val counts = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.keySet === counts.keySet)
    bySrc.foreach { case (src, rows) =>
      val n = counts(src)
      val m = rows.map(t => t._2 -> t._3).toMap
      assert(m.getOrElse("train", 0L) === n * 8 / 10, s"$src train quota")
      assert(m.getOrElse("val", 0L) === n / 10, s"$src val quota")
      assert(m.values.sum === n, s"$src splits must tile the source")
    }
  }

  test("q355: assignment is deterministic (same manifest twice)") {
    val a = SparkEntry.queries("q355_split_manifest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val b = SparkEntry.queries("q355_split_manifest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(a === b)
  }

  test("q356: JS divergence is nonnegative (up to term-floor slack), " +
    "bounded by ln 2, and zero-ish only for corpus-like sources") {
    val out = SparkEntry.queries("q356_js_divergence")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty)
    out.foreach { case (src, js) =>
      // per-term floors can pull a tiny true JS below zero by at most
      // |V| micro per KL half
      assert(js > -1000L, s"$src JS suspiciously negative")
      assert(js < 693148L, s"$src JS above ln 2")
    }
  }
}
