package graft

import org.apache.spark.sql.functions._

/** Invariant specs for q346–q348 (oracle parity checks the values;
  * these replay the driver-side models independently).
  */
class Pipeline65Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q346: ranked costs ascend, every order is chain-connected, " +
    "and the FK chain's own direction wins") {
    val out = SparkEntry.queries("q346_join_order_advisor")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val costs = out.map(_._3)
    assert(costs.zip(costs.tail).forall { case (a, b) => a <= b },
      "ranked costs must ascend")
    val edges = Set(
      Set("lineitem", "orders"), Set("orders", "customer"),
      Set("customer", "nation"), Set("nation", "region"))
    out.foreach { case (_, ord, _, _) =>
      val ts = ord.split(">").toSeq
      ts.indices.drop(1).foreach { i =>
        assert(ts.take(i).exists(a => edges.contains(Set(a, ts(i)))),
          s"$ord joins ${ts(i)} with no connecting edge")
      }
    }
    val baseTotal = Seq("lineitem", "orders", "customer", "nation",
      "region").map(t => spark.read.parquet(s"$dir/$t.parquet").count()).sum
    assert(out.head._4 === baseTotal, "stats fingerprint")
    // on unique-parent FK data every join shrinks nothing: starting
    // from a SMALL end keeps intermediates small, so the best order
    // must not start with lineitem (the fact table)
    assert(!out.head._2.startsWith("lineitem"),
      s"fact-table-first should not win: ${out.head._2}")
  }

  test("q347: centroids and coherence replay exactly from the " +
    "integer-micro moment arithmetic") {
    val rows = Tables.embeddings(spark, dir)
      .select(col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val byLabel = rows.groupBy(_._1)
    val cents = byLabel.view.mapValues { vs =>
      val d = vs.head._2.length
      val n = vs.length
      Array.tabulate(d) { i =>
        val sMicro = vs.map(v => math.rint(v._2(i) * 1000000.0).toLong).sum
        (sMicro.toDouble / 1000000.0) / n
      }
    }.toMap
    def cosMicro(v: Array[Double], c: Array[Double]): Long = {
      val dot = v.indices.foldLeft(0.0)((s, i) => s + v(i) * c(i))
      val nv = math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x))
      val nc = math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x))
      BigDecimal(dot / (nv * nc) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val want = byLabel.view.map { case (l, vs) =>
      val s = vs.map(v => cosMicro(v._2, cents(l))).sum
      val m = if (s < 0) -((-s) / vs.length) else s / vs.length
      l -> (vs.length.toLong, m)
    }.toMap
    val out = SparkEntry.queries("q347_label_coherence")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out === want, "coherence replay")
    out.values.foreach { case (_, m) =>
      assert(m > 0L && m <= 1000000L,
        "labeled clusters should cohere positively")
    }
  }

  test("q348: decayed counts replay the constant weight table; decay " +
    "never exceeds the raw mass") {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val maxDay = ev.map(_._2).max
    val w = (0 until 30).map(a =>
      a.toLong -> math.floor(1000.0 * math.pow(0.9, a)).toLong).toMap
    val want = ev.groupBy(_._1).view.mapValues { rs =>
      val raw = rs.length.toLong
      val dec = rs.map { case (_, d) =>
        w.getOrElse(java.time.temporal.ChronoUnit.DAYS.between(d, maxDay),
          0L)
      }.sum
      (raw, dec)
    }.toMap
    val out = SparkEntry.queries("q348_decayed_counts")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out === want, "decayed replay")
    out.values.foreach { case (raw, dec) =>
      assert(dec <= raw * 1000L, "decay is a discount, never a boost")
    }
  }
}
