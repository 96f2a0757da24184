package graft

import graft.streaming.StreamContainIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the containment arrival candidate join (guide
  * §3.2): current shape vs a Bloom pre-filter on the standing-index
  * side. Prints both plans and per-variant (wall, rows) over the
  * sf0.1 corpus — measurement evidence for OPTIMIZATION_r17.md.
  */
object ContainAB {
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
    val t = 0.9
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val hot = StreamContainIndex.trainHotSet(docs, "doc_id", "text", 512)
    // prior = slices 0+1 posted, batch = slice 2 (the q409 round-2 shape)
    val store = new java.io.File("target/contain_ab_store").getAbsolutePath
    graft.ops.Fs.wipe(store)
    (0 until 2).foreach { b =>
      StreamContainIndex.applyBatch(
        docs.where(pmod(col("doc_id"), lit(3)) === b), b.toLong,
        "doc_id", "text", store, hot)
    }
    val batch = docs.where(pmod(col("doc_id"), lit(3)) === 2)
    val posts = StreamContainIndex.batchPosts(batch, "doc_id", "text", hot)
    val prior = StreamContainIndex.posts(spark, store).localCheckpoint()
    println(s"[ab] prior rows=${prior.count()} batch posts rows=${posts.count()}")

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"[ab] $tag rep=$rep rows=$n wall=${(System.nanoTime()-t0)/1e9}%.2fs")
      }
      println(s"[ab] ==== plan $tag ====")
      println(mk.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(8000))
    }

    time("current")(StreamContainIndex.arrivalCandidates(posts, prior, t))

    // §3.2 variant: Bloom over the batch's posting toks, pre-filtering
    // the prior side before both candidate legs (lossless for true
    // matches: every joined tok is a batch tok)
    time("bloom") {
      val nToks = posts.select("tok").distinct().count()
      val bf = posts.stat.bloomFilter("tok", math.max(nToks, 1000), 0.01)
      val bfB = spark.sparkContext.broadcast(bf)
      val mightMatch = udf((tok: Long) => bfB.value.mightContainLong(tok))
      StreamContainIndex.arrivalCandidates(posts,
        prior.where(mightMatch(col("tok"))), t)
    }
    spark.stop()
  }
}
