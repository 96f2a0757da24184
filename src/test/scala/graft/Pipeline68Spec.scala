package graft

import org.apache.spark.sql.functions._

/** Invariant specs for q353/q354. */
class Pipeline68Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q353: per-source scores replay tf·floor(1e6·ln((N+1)/(df+1))) " +
    "and every emitted term beats the 11th") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.TextAnalysis.tokens(col("text")))
          .as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val n = docs.map(_._1).distinct.length.toLong
    val df = docs.map(t => (t._1, t._3)).distinct.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val tf = docs.groupBy(t => (t._2, t._3)).view
      .mapValues(_.size.toLong).toMap
    def score(src: String, tok: String): Long =
      tf((src, tok)) * math.floor(
        1000000.0 * math.log((n + 1.0) / (df(tok) + 1.0))).toLong
    val out = SparkEntry.queries("q353_source_keywords")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (src, _, tok, tfv, sc) =>
      assert(tfv === tf((src, tok)), s"$src/$tok tf")
      assert(sc === score(src, tok), s"$src/$tok score replay")
    }
    // per source: ranks are 1..10 and every emitted score >= any
    // non-emitted term's score (with the tok tiebreak)
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length))
      val emitted = rows.map(_._3).toSet
      // the WORST emitted contest key (ascending (-score, tok)): every
      // non-emitted term must rank at or below it
      val worstEmitted = rows.map(r => (-r._5, r._3)).max
      tf.keys.filter(_._1 == src).map(_._2).toSeq.distinct
        .filterNot(emitted).foreach { tok =>
          assert(Ordering[(Long, String)].gteq(
            (-score(src, tok), tok), worstEmitted),
            s"$src skipped a better term $tok")
        }
    }
  }

  test("q354: active = new + returning; new sums to the user count; " +
    "day-one actives are all new") {
    val out = SparkEntry.queries("q354_new_vs_returning")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (d, a, nw, ret) =>
      assert(a === nw + ret, s"$d decomposition")
      assert(nw >= 0 && ret >= 0)
    }
    val users = Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(out.map(_._3).sum === users,
      "every user is new exactly once")
    assert(out.head._4 === 0L, "nobody returns on the first day")
  }
}
