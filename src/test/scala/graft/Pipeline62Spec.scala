package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the q336–q342 wave (oracle parity checks the
  * values; these replay the semantics from the outputs or brute force).
  */
class Pipeline62Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q336: d_micro replays a brute-force KS statistic; the reject " +
    "rule replays from the output's own columns") {
    val data = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = SparkEntry.queries("q336_ks_source_drift")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    val vals = data.map(_._2).distinct.sorted
    out.foreach { case (src, ns, nr, dMicro, reject) =>
      val mine = data.filter(_._1 == src).map(_._2)
      val rest = data.filter(_._1 != src).map(_._2)
      assert(ns === mine.length.toLong && nr === rest.length.toLong)
      val dScaled = vals.map { v =>
        math.abs(mine.count(_ <= v).toLong * nr -
          rest.count(_ <= v).toLong * ns)
      }.max
      assert(dMicro === dScaled * 1000000L / (ns * nr), s"$src D")
      val wantReject = (dMicro * dMicro / 1000000L) *
        (ns * nr / (ns + nr)) > 1844164L
      assert(reject === wantReject, s"$src reject rule")
    }
  }

  test("q337: u2/auc replay the brute-force pair count (ties at half " +
    "weight)") {
    val data = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = SparkEntry.queries("q337_auc_mann_whitney")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    out.take(6).foreach { case (src, ns, nr, u2, auc) =>
      val mine = data.filter(_._1 == src).map(_._2)
      val rest = data.filter(_._1 != src).map(_._2)
      val want2U = mine.map(a =>
        2L * rest.count(_ < a) + rest.count(_ == a).toLong).sum
      assert(u2 === want2U, s"$src U")
      assert(auc === u2 * 1000000L / (2 * ns * nr), s"$src AUC")
    }
  }

  test("q338: the OLS fit replays in Scala from the top-200 token " +
    "counts, quantization and sign-split divisions included") {
    val toks = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text")))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(200)
      .collect().map(_.getLong(1))
    val q = toks.zipWithIndex.map { case (cnt, i) =>
      (math.floor(1000.0 * math.log(i + 1.0)).toLong,
        math.floor(1000.0 * math.log(cnt.toDouble)).toLong)
    }
    val r = q.length.toLong
    val (sx, sy) = (q.map(_._1).sum, q.map(_._2).sum)
    val sxx = q.map(t => t._1 * t._1).sum
    val sxy = q.map(t => t._1 * t._2).sum
    val num = r * sxy - sx * sy
    val den = r * sxx - sx * sx
    def sdiv(a: Long, b: Long): Long = if (a < 0) -((-a) / b) else a / b
    val slope = sdiv(1000L * num, den)
    val icnum = sy - sdiv(num * sx, den)
    val intercept = sdiv(icnum, r)
    val out = SparkEntry.queries("q338_zipf_fit")(spark, dir)
      .collect().head
    assert(out.getLong(0) === r)
    assert(out.getLong(1) === slope, "slope replay")
    assert(out.getLong(2) === intercept, "intercept replay")
    assert(slope < 0, "a Zipf-ish vocabulary slopes down")
  }

  test("q339: per-alpha weights sum to ~1e6; alpha=1 is mass-" +
    "proportional; lower alpha flattens (entropy grows)") {
    val out = SparkEntry.queries("q339_temperature_mix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byAlpha = out.groupBy(_._2)
    assert(byAlpha.keySet === Set(300L, 500L, 700L, 1000L))
    val s = out.map(_._1).distinct.length
    byAlpha.foreach { case (a, rows) =>
      val tot = rows.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - s,
        s"alpha=$a weights sum $tot")
    }
    def entropy(rows: Seq[Long]): Double = {
      val t = rows.sum.toDouble
      -rows.filter(_ > 0).map(w => w / t * math.log(w / t)).sum
    }
    val e300 = entropy(byAlpha(300L).map(_._4).toSeq)
    val e1000 = entropy(byAlpha(1000L).map(_._4).toSeq)
    assert(e300 >= e1000, "temperature must flatten the mixture")
    // alpha=1000: weight ratios track mass ratios (exact up to floor)
    val a1 = byAlpha(1000L).toSeq
    val totM = a1.map(_._3).sum
    a1.foreach { case (src, _, m, w) =>
      val want = math.floor(m.toDouble / totM * 1e6).toLong
      assert(math.abs(w - want) <= 1L, s"$src alpha=1 weight")
    }
  }

  test("q340: MAU replays the brute-force 30-day window; stickiness " +
    "is the integer ratio; DAU <= MAU") {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val out = SparkEntry.queries("q340_dau_mau_stickiness")(spark, dir)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (d, dau, mau, st) =>
      val wantDau = ud.count(_._2 == d).toLong
      val wantMau = ud.filter { case (_, ad) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(30))
      }.map(_._1).distinct.length.toLong
      assert(dau === wantDau, s"$d DAU")
      assert(mau === wantMau, s"$d MAU")
      assert(st === dau * 1000L / mau)
      assert(dau <= mau)
    }
  }

  test("q341: every ranked doc outscores the 11th; zero-tf docs are " +
    "still scored (scores are finite negatives)") {
    val out = SparkEntry.queries("q341_qlm_dirichlet")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.length === 10)
    assert(out.map(_._3).toSeq === (1 to 10))
    val scores = out.sortBy(_._3).map(_._2)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must descend with rank")
    assert(scores.forall(_ < 0L), "QLM log-likelihoods are negative")
  }

  test("q342: the 64-dim row is the identity; overlaps live in " +
    "[0, 10] and the full-dim row dominates nothing it shouldn't") {
    val out = SparkEntry.queries("q342_matryoshka_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.keySet === Set(8L, 16L, 32L, 64L))
    assert(out(64L) === 10L, "P=64 must reproduce the full top-10")
    out.values.foreach(v => assert(v >= 0L && v <= 10L))
  }
}
