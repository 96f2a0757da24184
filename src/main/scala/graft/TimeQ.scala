package graft

import org.apache.spark.sql.SparkSession

/** Times selected queries (all if no args) with warm-up, for local
  * perf iteration: `runMain graft.TimeQ q66_neardup_prefix [reps]`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (repArgs, nameArgs) = args.partition(_.forall(_.isDigit))
    val reps = repArgs.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same artifact regime as Bench: set SPARK_GRAFT_NO_ARTIFACTS=1 to
    // time the pure inline-build shape
    if (!sys.env.contains("SPARK_GRAFT_NO_ARTIFACTS"))
      spark.conf.set(graft.ops.ArtifactStore.RootConf,
        new java.io.File("target/artifacts").getAbsolutePath)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = if (nameArgs.nonEmpty) nameArgs.toSet else SparkEntry.queries.keySet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names(name)) {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          (dt, n)
        }
        println(f"$name%-28s rows=${ts.head._2}%-8d " +
          ts.map { case (dt, _) => f"$dt%.2fs" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
