package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A query failure is
  * recorded per-query (`"errors"` map) and flips the exit code — a
  * regression must never masquerade as a speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    var errors = List.empty[(String, String)]
    // warm the JVM/codegen paths so the first measured query doesn't
    // absorb session startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors ::= name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // free the query's leftover localCheckpoint RDDs (outside the
      // timed section): without this, ~100 queries of checkpoints
      // accumulate storage memory and the iterative tail queries pay
      // the pressure (measured: q79 4 s isolated vs 14 s late in the
      // run)
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      name -> dt
    }
    // The driver captures only the last ~2000 chars of output; with 89
    // queries a full-name map overflows that window and the JSON line is
    // truncated mid-line (BENCH_r01..r06 all show "parsed": null). Emit
    // short keys (the qNN prefix, unique by construction) rounded to ms
    // so the ONE parseable line always fits; the full-name map goes to a
    // local file for humans.
    // Locale.ROOT, not the f-interpolator: a comma-decimal default
    // locale (de_DE, fr_FR) would print 1,234 and corrupt the JSON
    def ms(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    try {
      val w = new java.io.PrintWriter("target/bench_full.json")
      try w.println(s"""{"total":${ms(total)},"queries":$fullQs,"sf":"$sfDir"}""") finally w.close()
    } catch { case _: Throwable => () }
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
