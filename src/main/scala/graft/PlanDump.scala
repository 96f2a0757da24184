package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries to
  * plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
  * files): `runMain graft.PlanDump <tag> <suffix> q1_agg ...`.
  * The query function RUNS first (count) so late-bound state — artifact
  * builds, driver-computed literals — is settled, then the plan of a
  * fresh invocation is captured; for lifecycle queries that is the
  * final-serve shape, the plan whose scale behavior matters.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(graft.ops.ArtifactStore.RootConf,
      new java.io.File("target/artifacts").getAbsolutePath)
    val outDir = new java.io.File(s"plans/$tag")
    outDir.mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names(name)) {
        try {
          fn(spark, sfDir).count() // settle lifecycle / late-bound state
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(
            new java.io.File(outDir, s"${name}_$suffix.txt"))
          try w.println(plan) finally w.close()
          println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
