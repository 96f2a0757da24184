package graft

import graft.ops.Inventory
import org.apache.spark.sql.Row

/** Inventory (latest-per-key + incremental merge) semantics, including
  * the reference's `coalesce(EXCLUDED, old)` rule
  * (ref: migrations/1610634227:27) — SURVEY §7.5 risk #6.
  */
class InventorySpec extends SparkSpec {
  import spark.implicits._

  private def rows(t: (String, Long, String, java.lang.Long)*) =
    t.toSeq.toDF("key", "ver", "status", "scale")

  test("latestPerKey picks the newest row's values") {
    val df = rows(("a", 1, "s1", 10L), ("a", 3, "s3", 30L), ("a", 2, "s2", 20L))
    val out = Inventory.latestPerKey(df, Seq("key"), "ver",
      Seq("status", "scale")).collect()
    assert(out === Array(Row("a", "s3", 30L, 1L, 3L, 3L)))
  }

  test("coalesce column keeps last NON-null, plain column takes latest null") {
    val df = rows(("a", 1, "s1", 10L), ("a", 2, "s2", null), ("a", 3, "s3", null))
    val plain = Inventory.latestPerKey(df, Seq("key"), "ver",
      Seq("status", "scale")).collect()
    assert(plain.head.getAs[Any]("last_scale") == null,
      "without coalesce the latest (null) value wins")
    val co = Inventory.latestPerKey(df, Seq("key"), "ver",
      Seq("status", "scale"), Set("scale")).collect()
    assert(co.head.getAs[Long]("last_scale") === 10L,
      "with coalesce the last non-null (ver=1) wins")
  }

  test("coalesce column is null when never set") {
    val df = rows(("a", 1, "s1", null), ("a", 2, "s2", null))
    val out = Inventory.latestPerKey(df, Seq("key"), "ver",
      Seq("status", "scale"), Set("scale")).collect()
    assert(out.head.getAs[Any]("last_scale") == null)
  }

  test("mergeBatch fold over ordered batches == single-shot latestPerKey") {
    val all = rows(
      ("a", 1, "a1", 10L), ("a", 4, "a4", null), ("b", 2, "b2", null),
      ("b", 5, "b5", 50L), ("c", 3, "c3", null), ("a", 6, "a6", null),
      ("c", 7, "c7", null), ("b", 8, "b8", null))
    val single = Inventory.latestPerKey(all, Seq("key"), "ver",
      Seq("status", "scale"), Set("scale"))
    val b1 = all.filter($"ver" <= 3)
    val b2 = all.filter($"ver" > 3 && $"ver" <= 6)
    val b3 = all.filter($"ver" > 6)
    val st1 = Inventory.latestPerKey(b1, Seq("key"), "ver",
      Seq("status", "scale"), Set("scale"))
    val st2 = Inventory.mergeBatch(st1, b2, Seq("key"), "ver",
      Seq("status", "scale"), Set("scale"))
    val st3 = Inventory.mergeBatch(st2, b3, Seq("key"), "ver",
      Seq("status", "scale"), Set("scale"))
    val a = single.orderBy("key").collect()
    val b = st3.select(single.columns.map(org.apache.spark.sql.functions.col): _*)
      .orderBy("key").collect()
    assert(a === b)
    // the coalesce rule survived three merges: a's scale set at ver=1
    val aRow = b.find(_.getString(0) == "a").get
    assert(aRow.getAs[Long]("last_scale") === 10L)
  }

  test("mergeBatch inserts new keys with first_ver from the batch") {
    val st = Inventory.latestPerKey(rows(("a", 1, "s1", 1L)), Seq("key"),
      "ver", Seq("status", "scale"), Set("scale"))
    val out = Inventory.mergeBatch(st, rows(("z", 9, "z9", null)), Seq("key"),
      "ver", Seq("status", "scale"), Set("scale"))
      .filter($"key" === "z").collect()
    assert(out.head.getAs[Long]("first_ver") === 9L)
    assert(out.head.getAs[Long]("n_rows") === 1L)
  }

  test("updated_at touch: changes on update, survives on non-update") {
    import org.apache.spark.sql.functions.lit
    val t1 = Some("updated_at" -> lit(100L))
    val t2 = Some("updated_at" -> lit(200L))
    val st = Inventory.latestPerKey(rows(("a", 1, "a1", 1L), ("b", 2, "b2", null)),
      Seq("key"), "ver", Seq("status", "scale"), Set("scale"), touch = t1)
    assert(st.collect().forall(_.getAs[Long]("updated_at") === 100L),
      "a fresh fold touches every row")
    // batch touches only b (and inserts z): a must keep its old touch
    val out = Inventory.mergeBatch(st,
      rows(("b", 5, "b5", null), ("z", 6, "z6", null)),
      Seq("key"), "ver", Seq("status", "scale"), Set("scale"), touch = t2)
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Long]("updated_at")).toMap
    assert(out("a") === 100L, "non-updated row keeps its updated_at")
    assert(out("b") === 200L, "updated row is touched")
    assert(out("z") === 200L, "inserted row is touched")
  }

  test("mergeBatch ignores a batch that is older than state for a key") {
    // ver-ordered ingest never produces this, but the guard must hold
    val st = Inventory.latestPerKey(rows(("a", 10, "s10", null)), Seq("key"),
      "ver", Seq("status", "scale"), Set("scale"))
    val out = Inventory.mergeBatch(st, rows(("a", 5, "s5", 5L)), Seq("key"),
      "ver", Seq("status", "scale"), Set("scale")).collect()
    assert(out.head.getAs[String]("last_status") === "s10")
    assert(out.head.getAs[Long]("n_rows") === 2L)
    assert(out.head.getAs[Long]("first_ver") === 5L)
  }
}
