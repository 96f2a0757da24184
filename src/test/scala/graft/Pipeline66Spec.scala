package graft

import graft.queries.PipelineQueries66
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Invariant specs for q349/q350. */
class Pipeline66Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Scala twin of Sketches.hash60 (first 15 md5 hex digits). */
  private def hash60(t: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes(StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString.take(15), 16)

  test("pav: monotone input unchanged; one violation pools to the " +
    "exact weighted rate; output always nondecreasing") {
    val mono = Seq((10L, 1L), (10L, 3L), (10L, 7L))
    assert(PipelineQueries66.pav(mono) === Seq(100L, 300L, 700L))
    // (n=10,pos=8)=800 then (n=30,pos=6)=200 violates: pools to
    // 14/40 = 350
    val pooled = PipelineQueries66.pav(Seq((10L, 8L), (30L, 6L)))
    assert(pooled === Seq(350L, 350L))
    val rnd = new scala.util.Random(60)
    val bins = Seq.fill(12)((rnd.nextInt(20) + 1L, rnd.nextInt(10).toLong))
      .map { case (n, p) => (n, math.min(n, p)) }
    val iso = PipelineQueries66.pav(bins)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      "PAV output must be nondecreasing")
  }

  test("q349: iso_milli is the PAV fit of the query's own bins and " +
    "is monotone") {
    val out = SparkEntry.queries("q349_isotonic_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(out.nonEmpty)
    val want = PipelineQueries66.pav(out.map(t => (t._2, t._3)).toSeq)
    assert(out.map(_._5).toSeq === want, "iso replay")
    val iso = out.map(_._5)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    out.foreach { case (_, n, pos, raw, _) =>
      assert(raw === (if (n == 0) 0L else pos * 1000L / n))
    }
  }

  test("q350: both schemes replay in Scala; mod moves ~N/(N+1), the " +
    "ring moves ~1/(N+1)") {
    val keys = Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0))
    def ring(nodes: Int): Seq[(Long, Long)] =
      for (n <- 0L until nodes.toLong; v <- 0L until 16L)
        yield (n, hash60(s"ring:$n:$v"))
    def owner(h: Long, r: Seq[(Long, Long)]): Long =
      r.map { case (n, pos) =>
        val d = {
          val m = (pos - h) % (1L << 60)
          if (m < 0) m + (1L << 60) else m
        }
        (d, n)
      }.min._2
    val (r8, r9) = (ring(8), ring(9))
    var modMoved = 0L
    var ringMoved = 0L
    keys.foreach { k =>
      val h = hash60(s"key:$k")
      if (((h % 8) + 8) % 8 != ((h % 9) + 9) % 9) modMoved += 1
      if (owner(h, r8) != owner(h, r9)) ringMoved += 1
    }
    val out = SparkEntry.queries("q350_resharding_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("mod")._1 === keys.length.toLong)
    assert(out("mod")._2 === modMoved, "mod scheme replay")
    assert(out("ring")._2 === ringMoved, "ring scheme replay")
    assert(out("mod")._3 > 600L, "mod-N must move most keys")
    assert(out("ring")._3 < 400L, "the ring must move few keys")
    assert(out("ring")._3 < out("mod")._3)
  }
}
