package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query profiling for optimization work (guide §1): wall time,
  * Spark job/stage/task counts, summed task time, shuffle bytes, and
  * input bytes — the split that says whether a query is compute-bound
  * (task time ≈ wall × cores) or scheduling/driver-bound (task time ≪
  * wall). `runMain graft.Prof q119_bpe_apply [reps]`; set
  * SPARK_GRAFT_WIPE_ARTIFACTS=1 to replicate Bench's cold-artifact
  * regime (default keeps target/artifacts, the serve regime).
  */
object Prof {

  private class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var inputB = 0L
    @volatile var gcMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
        inputB += m.inputMetrics.bytesRead
      }
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0
      shuffleReadB = 0; shuffleWriteB = 0; inputB = 0; gcMs = 0
    }
  }

  /** Catalyst phase-time accumulator: sums the QueryPlanningTracker's
    * analysis/optimization/planning durations and the total action
    * duration across every action a query runs — the driver-side half
    * the job metrics can't see. */
  private class QeAcc
      extends org.apache.spark.sql.util.QueryExecutionListener {
    @volatile var actions = 0
    @volatile var actionMs = 0L
    @volatile var phaseMs = scala.collection.mutable.Map[String, Long]()
    override def onSuccess(f: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit = synchronized {
      actions += 1
      actionMs += durationNs / 1000000
      qe.tracker.phases.foreach { case (p, s) =>
        phaseMs(p) = phaseMs.getOrElse(p, 0L) + (s.endTimeMs - s.startTimeMs)
      }
    }
    override def onFailure(f: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        e: Exception): Unit = ()
    def reset(): Unit = synchronized {
      actions = 0; actionMs = 0
      phaseMs = scala.collection.mutable.Map[String, Long]()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (repArgs, nameArgs) = args.partition(_.forall(_.isDigit))
    val reps = repArgs.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // conf overrides ("k=v,k=v") for A/B experiments, same syntax as
    // Verify's capped lane
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    if (sys.env.contains("SPARK_GRAFT_WIPE_ARTIFACTS"))
      graft.ops.Fs.wipe(new java.io.File("target/artifacts").getAbsolutePath)
    spark.conf.set(graft.ops.ArtifactStore.RootConf,
      new java.io.File("target/artifacts").getAbsolutePath)
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val qeAcc = new QeAcc
    spark.listenerManager.register(qeAcc)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = if (nameArgs.nonEmpty) nameArgs.toSet else SparkEntry.queries.keySet
    def mb(b: Long): String = f"${b / 1048576.0}%.1fMB"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names(name)) {
        (1 to reps).foreach { rep =>
          // settle listener events from the previous run (the bus is
          // private; a short sleep drains it well enough for profiling)
          Thread.sleep(150)
          acc.reset(); qeAcc.reset()
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(150)
          val ph = qeAcc.phaseMs.toSeq.sortBy(_._1)
            .map { case (p, ms) => f"$p=${ms / 1000.0}%.2fs" }.mkString(" ")
          println(f"[prof] $name%-34s rep=$rep rows=$n%-7d wall=$dt%6.2fs " +
            f"jobs=${acc.jobs}%-4d stages=${acc.stages}%-4d tasks=${acc.tasks}%-6d " +
            f"taskTime=${acc.taskTimeMs / 1000.0}%7.2fs gc=${acc.gcMs / 1000.0}%5.2fs " +
            s"in=${mb(acc.inputB)} sr=${mb(acc.shuffleReadB)} sw=${mb(acc.shuffleWriteB)} " +
            f"actions=${qeAcc.actions} actionT=${qeAcc.actionMs / 1000.0}%.2fs $ph")
          spark.sparkContext.getPersistentRDDs.valuesIterator
            .foreach(_.unpersist(blocking = false))
        }
      }
    }
    spark.stop()
  }
}
