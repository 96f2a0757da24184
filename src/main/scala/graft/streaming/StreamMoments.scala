package graft.streaming

import graft.ops.Moments
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming twin of the q277/q278 moment layer: the second-moment
  * vector is maintained continuously across micro-batches.
  *
  * Shape matters here: each batch runs the SAME distributed
  * map-side-combined aggregator the batch queries use (so no single
  * task ever sees more than its partition), and only the finished
  * 2145-long moment vector reaches the driver, which adds it into the
  * store — moment merge is plain addition, exactly the property that
  * makes the one-pass aggregator the 100 TB path. A
  * flatMapGroupsWithState on a constant key would instead shuffle
  * every row to one state task — the anti-pattern this twin exists to
  * avoid demonstrating.
  *
  * The store is a single text file of longs, written via temp-file +
  * atomic rename (the BlockIngest manifest discipline): a crash
  * between batches never leaves a torn vector.
  */
object StreamMoments {

  def readStore(path: String, d: Int): Array[Long] = {
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.readString(p).trim.split(",").map(_.toLong)
    else new Array[Long](1 + d + d * (d + 1) / 2)
  }

  private def writeStore(path: String, m: Array[Long]): Unit = {
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, m.mkString(",").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Wire an embedding stream (any frame with `vecCol`) into the
    * moment store at `storePath`. */
  def run(stream: DataFrame, vecCol: String, d: Int, storePath: String,
          trigger: Trigger): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val bm = Moments.secondMomentsMilli(batch, vecCol, d)
          val cur = readStore(storePath, d)
          var i = 0
          while (i < cur.length) { cur(i) += bm(i); i += 1 }
          writeStore(storePath, cur)
        }
      }
}
