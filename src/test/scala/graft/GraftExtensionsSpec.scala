package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SQL function surface must be the same implementation as the
  * Column API — these tests pin value equality between `spark.sql` text
  * and the Column combinators for representative functions on each
  * wiring path (live registration and session-build extensions).
  */
class GraftExtensionsSpec extends SparkSpec {

  private def registered: SparkSession = {
    GraftFunctions.register(spark)
    spark
  }

  test("SQL graft_token_hash matches the Column API") {
    val s = registered
    val sqlVal = s.sql("SELECT graft_token_hash('hello') AS h").head().getLong(0)
    import s.implicits._
    val colVal = Seq("hello").toDF("t")
      .select(TextAnalysis.tokenHash(col("t"))).head().getLong(0)
    assert(sqlVal == colVal)
    assert(sqlVal == TextAnalysis.md5Hex8("hello"))
  }

  test("SQL minhash/simhash kernels match the Column API on real text") {
    val s = registered
    import s.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the long trip")
    ).toDF("id", "text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = s.sql(
      """SELECT id,
        |  graft_minhash(graft_shingle_hashes(graft_tokens(text)), 8) AS sig,
        |  graft_simhash(graft_tokens(text)) AS sh
        |FROM ext_docs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    val toks = df.select(col("id"), TextAnalysis.tokens(col("text")).as("toks"))
    val viaCol = toks.select(col("id"),
        TextAnalysis.minhashAffine(
          TextAnalysis.shingleHashes(col("toks")), 8).as("sig"),
        TextAnalysis.simhash32(col("toks")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("SQL winnowing and SQ8 functions match the Column/kernel APIs") {
    val s = registered
    import s.implicits._
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("id", "text")
    df.createOrReplaceTempView("ext_docs2")
    val viaSql = s.sql(
      """SELECT id,
        |  graft_winnow(graft_gram_hashes(graft_tokens(text), 5), 4) AS fps
        |FROM ext_docs2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val viaCol = df
      .select(col("id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("id"), TextAnalysis.winnowFingerprints(
        TextAnalysis.gramHashesPositional(col("toks"), 5), 4).as("fps"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(viaSql.toSeq == viaCol.toSeq)
    val sq = s.sql(
      """SELECT graft_sq8_approx(array(0.0D, 0.5D, 1.0D),
        |  array(0.0D, 0.0D, 0.0D), array(1.0D, 1.0D, 1.0D)) AS a""".stripMargin)
      .head().getSeq[Double](0)
    // codes 0, 127, 255 -> midpoints (c+0.5)*((hi-lo)/255), the
    // kernel's exact parenthesization
    val step = 1.0 / 255.0
    assert(sq == Seq(0.5 * step, 127.5 * step, 255.5 * step))
  }

  test("SQL h3/codec/geo functions evaluate correctly") {
    val s = registered
    val r = s.sql(
      """SELECT graft_hamming(7L, 1L) AS hd,
        |  graft_base64url('ab?cd>e') AS b64,
        |  graft_subnet_base(CAST(8 * 8388608 + 7 AS BIGINT)) AS base,
        |  graft_subnet_mask(CAST(8 * 8388608 + 7 AS BIGINT)) AS mask,
        |  round(graft_haversine_km(48.8566, 2.3522, 51.5074, -0.1278), 0)
        |    AS paris_london
        |""".stripMargin).head()
    assert(r.getAs[Int]("hd") == 2)
    assert(r.getAs[String]("b64") ==
      java.util.Base64.getUrlEncoder.withoutPadding()
        .encodeToString("ab?cd>e".getBytes("UTF-8")))
    assert(r.getAs[Long]("base") == 8L)
    assert(r.getAs[Long]("mask") == 7L)
    assert(r.getAs[Double]("paris_london") == 344.0) // known city pair
  }

  test("SQL graft_pii_redact scrubs every category") {
    val s = registered
    val r = s.sql(
      """SELECT graft_pii_redact(
        |  'mail a@b.com or http://x.org/z or 10.1.2.3 or +1-415-555-0000 end')
        |  AS t""".stripMargin).head().getString(0)
    assert(r == "mail <EMAIL> or <URL> or <IP> or <PHONE> end")
  }

  test("SQL graft_char_entropy_terms matches the kernel hand-check") {
    val s = registered
    // "aaab": n=4 code points, 2 distinct, sterm = floor(1000*3*ln3)
    val r = s.sql(
      "SELECT graft_char_entropy_terms('aaab') AS t").select("t.*")
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L &&
      r.getLong(2) == 3295L)
  }

  test("graft_minhash rejects a non-literal family size") {
    val s = registered
    val err = intercept[Exception] {
      s.sql("SELECT graft_minhash(array(1L), CAST(rand() * 4 AS INT))").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("spark.sql.extensions session-build path injects the functions") {
    // getOrCreate only applies extensions when it BUILDS a session, so
    // drop the active/default references (the SparkContext is reused),
    // build one with the extension class, and restore the shared session
    // afterwards.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne shared)
      val v = s2.sql("SELECT graft_token_hash('abc') AS h").head().getLong(0)
      assert(v == TextAnalysis.md5Hex8("abc"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("SQL HLL scalars match the Column API") {
    val s = registered
    import s.implicits._
    val got = s.sql(
      """SELECT graft_hll_bucket(graft_hash60('abc')) AS b,
        |  graft_hll_rho(graft_hash60('abc')) AS r""".stripMargin)
      .head()
    val exp = Seq("abc").toDF("t")
      .select(graft.ops.Sketches.hash60(col("t")).as("h"))
      .select(graft.ops.Sketches.hllBucket(col("h")),
        graft.ops.Sketches.hllRho(col("h")))
      .head()
    assert(got.getLong(0) == exp.getLong(0))
    assert(got.getLong(1) == exp.getLong(1))
  }
}
