package graft

import org.apache.spark.sql.functions._

/** Independent Scala replays for the monitoring group's two subtler
  * constructions: the CUSUM argmax (q274) and the 7-day rolling
  * distinct actives (q275 — replayed as the brute-force per-day
  * window the fanout construction must equal).
  */
class Pipeline32Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q274: CUSUM changepoint matches a direct Scala replay " +
    "(signed integer means, |S| desc / day asc tie rule)") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(1000.0)).cast("long").as("ym"))
      .as[(String, Long, Long)].collect()
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val daily = rs.groupBy(_._2).map { case (d, xs) =>
        (d, xs.size.toLong, xs.map(_._3).sum)
      }.toSeq.sortBy(_._1)
      val gmean = daily.map(_._3).sum / daily.map(_._2).sum
      var s = 0L
      val cusum = daily.map { case (d, n, sy) =>
        s += sy / n - gmean; (d, s)
      }
      val best = cusum.minBy { case (d, sv) => (-math.abs(sv), d) }
      t -> (best._1, best._2, math.abs(best._2))
    }
    val got = SparkEntry.queries("q274_cusum_changepoint")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (t, e) =>
      assert(got(t) === e, s"type $t: query ${got(t)} != replay $e")
    }
  }

  test("q275: rolling 7-day actives equal the brute-force per-day " +
    "distinct window") {
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(Long, Long)].collect().toSet
    val maxDay = pairs.map(_._2).max
    val minDay = pairs.map(_._2).min
    val expected = (minDay to maxDay).map { d =>
      d -> pairs.filter { case (_, pd) => pd >= d - 6 && pd <= d }
        .map(_._1).size.toLong
    }.filter(_._2 > 0).toMap
    val got = SparkEntry.queries("q275_rolling_actives")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("q272: variant sizes partition each type and the t2 rule is " +
    "internally consistent") {
    val counts = Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val got = SparkEntry.queries("q272_ab_lift")(spark, dir)
      .select("event_type", "n0", "n1", "var0_milli2", "var1_milli2",
        "t2_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, n0, n1, v0, v1, t2) =>
      assert(n0 + n1 === counts(t), s"type $t variant split lost rows")
      assert(v0 >= 0 && v1 >= 0, s"type $t negative variance")
      assert(t2 >= 0, s"type $t negative t²")
    }
  }
}
