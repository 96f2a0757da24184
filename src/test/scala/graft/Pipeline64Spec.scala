package graft

import org.apache.spark.sql.functions._

/** Invariants of the q343–q345 wave (oracle parity checks values). */
class Pipeline64Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q343: exact Jaccard replays brute force; the KMV estimate is " +
    "a bounded-error probe of it") {
    val vocab = Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.functions.TextAnalysis.tokens(col("text")))
          .as("tok"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val out = SparkEntry.queries("q343_kmv_set_ops")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, kmv, exact, err) =>
      val (sa, sb) = (vocab(a), vocab(b))
      val inter = (sa & sb).size.toLong
      val union = (sa | sb).size.toLong
      assert(exact === inter * 1000000L / union, s"$a-$b exact Jaccard")
      assert(err === math.abs(kmv - exact))
      assert(kmv >= 0L && kmv <= 1000000L)
      // K=128 bottom-k: se ≈ √(J(1−J)/K) ≤ ~44k micro; 200k micro is
      // the generous deterministic-fixture bound (~4.5 se)
      assert(err <= 200000L, s"$a-$b KMV error $err out of bound")
    }
  }

  test("q344: the top-20 paths replay a brute-force per-user trigram " +
    "count") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id").cast("long").as("e"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val counts = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val out = SparkEntry.queries("q344_event_paths")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.map(_._3).toSeq === (1 to out.length))
    assert(out.map(t => (t._1, t._2)).toSeq === want.take(out.length))
  }

  test("q345: padding conservation, strategy dominance (stream >= " +
    "paired >= single utilization), and a brute-force paired replay") {
    val lens = Tables.documents(spark, dir)
      .select(least(size(graft.functions.TextAnalysis.tokens(col("text")))
        .cast("long"), lit(512L)).as("c"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val content = lens.map(_._1).sum
    val n = lens.length.toLong
    val out = SparkEntry.queries("q345_packing_efficiency")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set("single", "stream", "paired"))
    out.foreach { case (st, (seqs, pad, util)) =>
      assert(pad === seqs * 512L - content, s"$st conservation")
      assert(util === content * 1000000L / (seqs * 512L))
    }
    assert(out("stream")._3 >= out("paired")._3)
    assert(out("paired")._3 >= out("single")._3)
    // brute-force paired: sort desc by (c, doc_id asc), pair ends
    val sorted = lens.sortBy { case (c, id) => (-c, id) }
    val half = (sorted.length + 1) / 2
    var seqs = 0L
    (0 until half).foreach { i =>
      val j = sorted.length - 1 - i
      if (i == j) seqs += 1
      else if (sorted(i)._1 + sorted(j)._1 <= 512L) seqs += 1
      else seqs += 2
    }
    assert(out("paired")._1 === seqs, "paired sequence count replay")
  }
}
