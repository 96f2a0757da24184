package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the sixtieth group (oracle parity checks the
  * values; these pin the semantics):
  *  - q332: the quintile scores REPLAY exactly from the output's own
  *    (r, f, m) columns under the documented arithmetic — exact value
  *    histograms + ceil(5·cum/N) for R/F, the q264 log-bucket key for
  *    M — so ties land deterministically on the documented side.
  *  - q333: the size estimate replays the manual arithmetic (UTF-8
  *    string bytes + 8 per numeric column per row) and the strategy
  *    flips exactly at the 10 MB byte threshold.
  */
class Pipeline60Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q332: every score replays from the output columns under the " +
    "documented quintile arithmetic, ties included") {
    val out = SparkEntry.queries("q332_rfm_segmentation")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(out.nonEmpty)
    val n = out.length.toLong
    def ceilQuintile(cum: Long): Long = (5L * cum + n - 1) / n
    def scoresOf[K: Ordering](keys: Seq[K]): Map[K, Long] = {
      val hist = keys.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      hist.scanLeft((null.asInstanceOf[K], 0L)) { case ((_, c), (k, v)) =>
        (k, c + v)
      }.drop(1).map { case (k, cum) => k -> ceilQuintile(cum) }.toMap
    }
    def mkey(m: Long): Long = {
      val e = if (m >= 1) 63L - java.lang.Long.numberOfLeadingZeros(m)
        else -1L
      val sb = if (m >= 1) (m >> math.max(e - 4, 0L).toInt) & 15L else 0L
      e * 16 + sb
    }
    val rq = scoresOf(out.map(_._2).toSeq)
    val fq = scoresOf(out.map(_._3).toSeq)
    val mq = scoresOf(out.map(t => mkey(t._4)).toSeq)
    out.foreach { case (uid, r, f, m, rs, fs, ms, rfm) =>
      assert(rs === 6L - rq(r), s"user $uid r_score")
      assert(fs === fq(f), s"user $uid f_score")
      assert(ms === mq(mkey(m)), s"user $uid m_score")
      assert(rfm === rs * 100 + fs * 10 + ms, s"user $uid rfm digits")
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 &&
        ms >= 1 && ms <= 5)
    }
  }

  test("q333: est_bytes replays the manual arithmetic and the " +
    "strategy flips exactly at the 10 MB threshold") {
    val out = SparkEntry.queries("q333_broadcast_advisor")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.map(_._1).sorted.toSeq ===
      Seq("customer", "nation", "orders", "part", "region", "supplier"))
    val specs: Map[String, (Seq[String], Int)] = Map(
      "region" -> (Seq("r_name"), 1), "nation" -> (Seq("n_name"), 2),
      "supplier" -> (Seq("s_name"), 3),
      "part" -> (Seq("p_name", "p_brand", "p_type"), 3),
      "customer" -> (Seq("c_name", "c_mktsegment"), 3),
      "orders" -> (Seq("o_orderstatus", "o_orderpriority"), 4))
    out.foreach { case (name, nRows, est, strategy) =>
      val (strCols, numCols) = specs(name)
      val df = spark.read.parquet(s"$dir/$name.parquet")
      val rows = df.count()
      assert(nRows === rows, s"$name row count")
      // UTF-8 byte sum, computed independently driver-side
      val strBytes = df
        .select(strCols.map(c => col(c).cast("string")): _*)
        .collect().map(_.toSeq.map(_.asInstanceOf[String]
          .getBytes("UTF-8").length.toLong).sum).sum
      val want = strBytes + rows * numCols * 8L
      assert(est === want, s"$name est_bytes: got $est want $want")
      val wantStrategy =
        if (est <= 10L * 1024 * 1024) "broadcast" else "shuffle"
      assert(strategy === wantStrategy, s"$name strategy")
    }
  }
}
