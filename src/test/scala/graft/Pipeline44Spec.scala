package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 additions: time-series repair
  * (q303/q304), robust statistics (q305), t-closeness (q306), storage
  * audits (q307/q308), weighted Jaccard (q309), sampling audit (q310),
  * novelty curve (q311), landmark closeness (q312). */
class Pipeline44Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q303: dense grid, LOCF equals the observation on observed " +
    "days and never regresses to null after the first observation") {
    val rows = SparkEntry.queries("q303_gap_fill_locf")(spark, dir)
      .as[(Long, Long, Option[Long], Int)].collect()
    val byUser = rows.groupBy(_._1)
    val nDays = rows.map(_._2).distinct.length
    byUser.foreach { case (u, rs) =>
      assert(rs.length === nDays, s"user $u grid not dense")
      var seen = false
      rs.sortBy(_._2).foreach { case (_, d, v, obs) =>
        if (obs === 1) {
          seen = true
          assert(v.nonEmpty, s"user $u day $d observed but null")
        }
        if (seen) assert(v.nonEmpty,
          s"user $u day $d: LOCF null after an observation")
      }
    }
    // at least one user actually has a gap that was filled
    assert(rows.exists { case (_, _, v, obs) => obs === 0 && v.nonEmpty })
  }

  test("q304: interpolated values lie between their surrounding " +
    "observations; kinds partition the grid") {
    val rows = SparkEntry.queries("q304_linear_interp")(spark, dir)
      .as[(Long, Long, Option[Long], String)].collect()
    assert(rows.map(_._4).toSet.subsetOf(Set("obs", "interp", "edge")))
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      val obsDays = sorted.filter(_._4 == "obs")
      sorted.filter(_._4 == "interp").foreach { case (_, d, Some(v), _) =>
        val prev = obsDays.filter(_._2 < d).maxBy(_._2)
        val next = obsDays.filter(_._2 > d).minBy(_._2)
        val lo = math.min(prev._3.get, next._3.get)
        val hi = math.max(prev._3.get, next._3.get)
        assert(v >= lo && v <= hi,
          s"user $u day $d interp $v outside [$lo, $hi]")
      case bad => fail(s"interp row with null value: $bad")
      }
    }
    assert(rows.count(_._4 == "interp") > 0, "fixture has no gaps")
  }

  test("q305: Theil-Sen matches an independent Scala replay of the " +
    "pairwise-slope lower median") {
    val got = SparkEntry.queries("q305_theil_sen_trend")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // independent replay: daily integer means from the raw events
    val d0 = Tables.events(spark, dir).agg(min(to_date($"ts"))).head.getDate(0)
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), lit(d0)).cast("long").as("d"),
        floor($"value" * 1000000.0).cast("long").as("vm"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.groupBy(_._2).map { case (d, xs) =>
          d -> xs.map(_._3).sum./(xs.length) // trunc: all non-negative
        }.toSeq.sortBy(_._1)
      }
    daily.foreach { case (t, dm) =>
      val slopes = (for {
        i <- dm.indices; j <- (i + 1) until dm.length
      } yield {
        val n = dm(j)._2 - dm(i)._2
        val dd = dm(j)._1 - dm(i)._1
        if (n < 0) -((-n) / dd) else n / dd
      }).sorted
      val median = slopes((slopes.length + 1) / 2 - 1)
      val (np, ts) = got(t)
      assert(np === slopes.length.toLong, s"$t pair count")
      assert(ts === median, s"$t Theil-Sen mismatch")
    }
  }

  test("q306: t-closeness is a bounded EMD") {
    val rows = SparkEntry.queries("q306_t_closeness")(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (l, src, ng, t) =>
      assert(ng > 0)
      assert(t >= 0 && t <= 1000000, s"($l,$src) t=$t out of [0,1]")
    }
  }

  test("q307: varint postings never cost more than raw int64 " +
    "postings and buckets partition the term set") {
    val rows = SparkEntry
      .queries("q307_postings_varint_cost")(spark, dir)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bkt, nt, np, vb, rb, cx) =>
      assert(bkt >= 1 && nt > 0 && np >= nt)
      assert(vb > 0 && vb <= rb, s"bucket $bkt varint $vb > raw $rb")
      assert(cx >= 1000000, s"bucket $bkt compression below 1x")
    }
  }

  test("q308: advisor metrics are consistent and low-cardinality " +
    "string columns dictionary-encode") {
    val rows = SparkEntry.queries("q308_encoding_advisor")(spark, dir)
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(rows.map(_._1).sorted.toSeq === Seq("lang", "n_chars", "source"))
    rows.foreach { case (c, n, nd, nr, pb, enc) =>
      assert(nd <= n && nr <= n && nd >= 1 && nr >= 1 && pb > 0)
      assert(nr >= nd,
        s"$c: every distinct value starts at least one run")
      assert(Set("DICT", "RLE", "PLAIN")(enc))
    }
    val lang = rows.find(_._1 == "lang").get
    assert(lang._6 === "DICT", "a handful of langs must dict-encode")
  }

  test("q309: weighted Jaccard is bounded, canonical, and finds every " +
    "exact duplicate pair") {
    val rows = SparkEntry
      .queries("q309_neardup_weighted_jaccard")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, j) =>
      assert(a < b)
      assert(j >= 800000 && j <= 1000000, s"($a,$b) j=$j")
    }
    val pairs = rows.map(r => (r._1, r._2)).toSet
    val dups = Tables.documents(spark, dir)
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size($"ids") > 1).as[(String, Seq[Long])].collect()
    dups.foreach { case (_, ids) =>
      val s = ids.sorted
      for (i <- s.indices; k <- (i + 1) until s.length)
        assert(pairs((s(i), s(k))),
          s"exact dup pair (${s(i)},${s(k)}) missed")
    }
  }

  test("q310: the 1/16 cluster sample estimates within 50% on every " +
    "return flag") {
    val rows = SparkEntry.queries("q310_sample_error_audit")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length >= 2)
    rows.foreach { case (f, ne, nt, se, st, en, es) =>
      assert(ne > 0 && se > 0)
      assert(nt > 0, s"$f: empty sample — the bucket hash is broken")
      assert(en < 500000, s"$f count error ${en / 10000.0}%")
      assert(es < 500000, s"$f sum error ${es / 10000.0}%")
    }
  }

  test("q311: novelty telescopes — bucket 0 is all-new, new_types sum " +
    "to the vocabulary, cum_vocab is its running sum") {
    val rows = SparkEntry.queries("q311_token_novelty")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._1 === 0L)
    assert(rows.head._6 === 1000000L, "bucket 0 must be 100% novel")
    assert(rows.map(_._4).sum === rows.last._5, "Σnew != final vocab")
    var cum = 0L
    rows.foreach { r => cum += r._4; assert(r._5 === cum) }
    rows.foreach { r =>
      assert(r._4 <= r._3 && r._3 <= r._2,
        s"bucket ${r._1}: new<=types<=occurrences violated")
    }
  }

  test("q312: closeness is bounded (every hop costs >= 1) and " +
    "landmarks are the lowest-id connected docs") {
    val rows = SparkEntry.queries("q312_landmark_closeness")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length >= 1 && rows.length <= 4)
    rows.foreach { case (l, n, sd, c) =>
      assert(n >= 1, s"landmark $l isolated — edge list broken")
      assert(sd >= n, s"landmark $l: sum dist < reached count")
      assert(c <= 1000000 && c > 0)
    }
  }
}
