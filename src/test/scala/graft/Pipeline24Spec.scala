package graft

import java.sql.Timestamp

/** Pins the q217 funnel's ORDER semantics with planted sequences —
  * the corpus fixture converts everyone, so only a constructed table
  * can show that a click before the first view (or a purchase before
  * the first qualified click) does NOT advance the funnel.
  */
class Pipeline24Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("q217: out-of-order stages do not convert") {
    val rows = Seq(
      // u1: view -> click -> purchase (full funnel)
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"),
      (3L, ts(3), 1L, "purchase"),
      // u2: click BEFORE view, then purchase: click doesn't qualify,
      // so neither does the purchase
      (4L, ts(1), 2L, "click"), (5L, ts(2), 2L, "view"),
      (6L, ts(3), 2L, "purchase"),
      // u3: view -> purchase -> click: click qualifies, purchase
      // precedes it and doesn't
      (7L, ts(1), 3L, "view"), (8L, ts(2), 3L, "purchase"),
      (9L, ts(3), 3L, "click"),
      // u4: purchase only
      (10L, ts(1), 4L, "purchase"),
      // u5: view -> click, no purchase
      (11L, ts(1), 5L, "view"), (12L, ts(2), 5L, "click"))
    val dir = java.nio.file.Files.createTempDirectory("p24").toString
    rows.map { case (id, t, u, ty) => (id, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = queries.PipelineQueries24.defs
      .find(_.name == "q217_event_funnel").get.fn(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("all") == ("all", 5L, 1000L))
    assert(got("view") == ("view", 4L, 800L), s"$got")
    assert(got("view_click") == ("view_click", 3L, 750L), s"$got")
    assert(got("view_click_purchase") ==
      ("view_click_purchase", 1L, 333L), s"$got")
  }

  test("q217: ties on ts at stage boundaries resolve by event_id " +
    "(the (tus, event_id) rule), incl. a purchase preceding any view") {
    val rows = Seq(
      // u1..u5: the baseline fixture from the ordering test
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"),
      (3L, ts(3), 1L, "purchase"),
      (4L, ts(1), 2L, "click"), (5L, ts(2), 2L, "view"),
      (6L, ts(3), 2L, "purchase"),
      (7L, ts(1), 3L, "view"), (8L, ts(2), 3L, "purchase"),
      (9L, ts(3), 3L, "click"),
      (10L, ts(1), 4L, "purchase"),
      (11L, ts(1), 5L, "view"), (12L, ts(2), 5L, "click"),
      // u6: ALL FOUR events at the same timestamp, event_id ascending
      // purchase -> view -> click -> purchase. The first purchase
      // precedes any view (never qualifies); the view then ADMITS the
      // tied click (view's event_id sorts first), and the final tied
      // purchase sees the qualified click — full conversion decided
      // purely by the event_id tiebreak
      (20L, ts(1), 6L, "purchase"), (21L, ts(1), 6L, "view"),
      (22L, ts(1), 6L, "click"), (23L, ts(1), 6L, "purchase"),
      // u7: same instant, but the click's event_id sorts BEFORE the
      // view's — the strict 1-PRECEDING frame hides the view, so
      // neither the click nor the trailing tied purchase qualifies
      (30L, ts(1), 7L, "click"), (31L, ts(1), 7L, "view"),
      (32L, ts(1), 7L, "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("p24t").toString
    rows.map { case (id, t, u, ty) => (id, t, u, ty, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = queries.PipelineQueries24.defs
      .find(_.name == "q217_event_funnel").get.fn(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("all") == ("all", 7L, 1000L))
    assert(got("view") == ("view", 6L, 857L), s"$got")
    assert(got("view_click") == ("view_click", 4L, 666L), s"$got")
    assert(got("view_click_purchase") ==
      ("view_click_purchase", 2L, 500L), s"$got")
  }
}
