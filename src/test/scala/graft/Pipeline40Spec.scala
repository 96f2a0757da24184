package graft

import org.apache.spark.sql.functions._

/** Invariants for the order-statistics group (q294-q296) and the
  * closing audits (q297-q300). */
class Pipeline40Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q296: the histogram-first skyline equals the brute-force " +
    "O(n²) dominance definition exactly") {
    val pts = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("lang"), col("doc_id"),
        size(col("toks")).cast("long").as("x"),
        size(array_distinct(col("toks"))).cast("long").as("y"))
      .as[(String, Long, Long, Long)].collect()
    val expected = pts.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      ps.toSeq.filter { case (_, id, x, y) =>
        !ps.exists { case (_, id2, x2, y2) =>
          id2 != id && x2 >= x && y2 >= y && (x2 > x || y2 > y)
        }
      }
    }.map(p => (p._1, p._2)).toSet
    val got = SparkEntry.queries("q296_pareto_skyline")(spark, dir)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got === expected,
      s"skyline mismatch: extra=${(got -- expected).take(5)} " +
        s"missing=${(expected -- got).take(5)}")
  }

  test("q295: Spearman is in [-1, 1] and positive for length vs " +
    "distinct-token count (Heaps-law association)") {
    val rows = SparkEntry
      .queries("q295_spearman_length_diversity")(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, r) =>
      assert(n > 0)
      assert(r >= -1000 && r <= 1000, s"$lang: spearman $r")
      assert(r > 0, s"$lang: longer docs must carry more distinct " +
        s"tokens on this corpus, got $r")
    }
  }

  test("q294: weighted medians never fall below unweighted ones " +
    "(token mass concentrates in longer documents)") {
    val rows = SparkEntry
      .queries("q294_weighted_length_sketch")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, w, p50, p90, wp50, wp90) =>
      assert(n > 0 && w > 0)
      assert(wp50 >= p50, s"$lang: weighted p50 $wp50 < plain $p50")
      assert(wp90 >= p90, s"$lang: weighted p90 $wp90 < plain $p90")
    }
  }

  test("q289: SCD2 intervals match an independent Scala replay — " +
    "(ts, event_id) order, change-only collapse, exclusive ends") {
    val evs = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3))
      val changes = ordered.zip(Option.empty[String] +:
          ordered.map(r => Some(r._4)).init)
        .collect { case (r, prev) if !prev.contains(r._4) => r }
      changes.zipWithIndex.map { case (c, i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._2)
          else None
        (u, c._4, (i + 1).toLong, c._2, to)
      }
    }.toSet
    val got = SparkEntry.queries("q289_scd2_intervals")(spark, dir)
      .as[(Long, String, Long, Long, Option[Long])].collect().toSet
    assert(got === expected,
      s"SCD2 mismatch: extra=${(got -- expected).take(3)} " +
        s"missing=${(expected -- got).take(3)}")
  }

  test("q297/q300: the collision census is consistent with the " +
    "scorecard's content-hash dup rate assumptions") {
    val census = SparkEntry
      .queries("q297_hash_collision_census")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    census.foreach { case (lang, nt, nh, lost, buckets) =>
      assert(nh <= nt, s"$lang: more hashes than tokens")
      assert(lost === nt - nh)
      assert(buckets <= lost.max(0L) * 2 + 1,
        s"$lang: bucket count inconsistent with lost tokens")
    }
    val Array(sc) = SparkEntry
      .queries("q300_corpus_scorecard")(spark, dir)
      .select("n_docs", "exact_dup_milli").as[(Long, Long)].collect()
    assert(sc._1 > 0)
    assert(sc._2 >= 0 && sc._2 <= 1000)
  }
}
