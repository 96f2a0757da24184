package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-JOB call-site log for one query — the drill-down companion to
  * [[Prof]] (guide §1: find where the serialized jobs come from before
  * cutting them). `runMain graft.JobLog q388_fact_sidecar_served`
  * prints one line per Spark job with its call site and task count.
  */
object JobLog {

  private class Log extends SparkListener {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      // the result stage's name carries the action's call site
      val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        .replace(' ', '·')
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      lines.add(f"[job] ${j.jobId}%4d $site%-60s $desc")
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val tt = i.taskMetrics.executorRunTime / 1000.0
      if (tt >= 0.2)
        lines.add(f"[stage] ${i.stageId}%4d tt=$tt%7.2fs tasks=${i.numTasks}%-4d " +
          i.name.replace(' ', '·'))
    }
  }

  def main(args: Array[String]): Unit = {
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
    if (sys.env.contains("SPARK_GRAFT_WIPE_ARTIFACTS"))
      graft.ops.Fs.wipe(new java.io.File("target/artifacts").getAbsolutePath)
    spark.conf.set(graft.ops.ArtifactStore.RootConf,
      new java.io.File("target/artifacts").getAbsolutePath)
    val log = new Log
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    spark.sparkContext.addSparkListener(log)
    args.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        log.lines.forEach(println)
        println(f"[joblog] $name rows=$n jobs=${log.lines.size} wall=$dt%.2fs")
        log.lines.clear()
      }
    }
    spark.stop()
  }
}
