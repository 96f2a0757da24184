package graft

import graft.ops.AsOf

/** As-of join semantics (ref: src/be_db_backfill.erl:288-299 — latest
  * value at or before the probe time).
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("picks latest right row at or before the left time, per key") {
    val left = Seq(("k1", 10L, "p1"), ("k1", 25L, "p2"), ("k2", 5L, "p3"))
      .toDF("key", "t", "tag")
    val right = Seq(("k1", 5L, 100L), ("k1", 20L, 200L), ("k2", 50L, 900L))
      .toDF("key", "t", "price")
    val out = AsOf.asofJoin(left, right, Seq("key"), "t", Seq("price"))
      .orderBy("tag").collect().map(r => (r.getAs[String]("tag"),
        Option(r.getAs[java.lang.Long]("asof_price")).map(_.toLong)))
    assert(out === Array(("p1", Some(100L)), ("p2", Some(200L)), ("p3", None)))
  }

  test("tie: a right row exactly at the probe time is visible (<=)") {
    val left = Seq(("k", 20L, "probe")).toDF("key", "t", "tag")
    val right = Seq(("k", 20L, 777L)).toDF("key", "t", "price")
    val out = AsOf.asofJoin(left, right, Seq("key"), "t", Seq("price")).collect()
    assert(out.head.getAs[Long]("asof_price") === 777L)
  }

  test("empty right side yields null, keeps all left rows") {
    val left = Seq(("k", 1L, "a"), ("k", 2L, "b")).toDF("key", "t", "tag")
    val right = Seq.empty[(String, Long, Long)].toDF("key", "t", "price")
    val out = AsOf.asofJoin(left, right, Seq("key"), "t", Seq("price")).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Any]("asof_price") == null))
  }

  test("multiple value columns are carried") {
    val left = Seq(("k", 10L, "x")).toDF("key", "t", "tag")
    val right = Seq(("k", 3L, 1L, 2L)).toDF("key", "t", "p", "q")
    val out = AsOf.asofJoin(left, right, Seq("key"), "t", Seq("p", "q")).collect()
    assert(out.head.getAs[Long]("asof_p") === 1L)
    assert(out.head.getAs[Long]("asof_q") === 2L)
  }
}
