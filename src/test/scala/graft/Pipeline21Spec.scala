package graft

import org.apache.spark.sql.functions._

/** Unit pins for the q208-q211 family: the fuzzy-decontamination
  * prefix filter actually SURFACES a planted paraphrase (recall of
  * the candidate path, which the oracle gate alone can't distinguish
  * from a shared miss — the q140 lesson), and the bottom-K quantile
  * sample degrades to exact when K covers the corpus.
  */
class Pipeline21Spec extends SparkSpec {
  import spark.implicits._

  /** The query-side salt-bucket function (md5 first-8-hex mod 20),
    * used to PICK doc ids that land in the needed split buckets.
    */
  private def bucket(salt: String, id: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt$id".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString, 16) % 20

  private def idsWhere(salt: String, p: Long => Boolean, n: Int): Seq[Long] =
    LazyList.iterate(0L)(_ + 1).filter(i => p(bucket(salt, i))).take(n).toList

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("p21").toString
    rows.map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("q208: a one-edit paraphrase across the split is found through " +
    "the rarest-gram prefix candidates") {
    val ev = idsWhere("fz:", _ == 19, 1).head
    val tr = idsWhere("fz:", _ < 19, 3)
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val dir = writeDocs(Seq(
      (ev, base.replace("theta", "thata"), "en"), // dist 1 from base
      (tr(0), base, "en"),
      (tr(1), "completely different words with no shared grams at all qq", "en"),
      (tr(2), base.replace("alpha", "omega7"), "en"))) // > 2 edits away
    val got = queries.PipelineQueries21.defs
      .find(_.name == "q208_fuzzy_decon").get.fn(spark, dir)
      .filter(col("doc_id") === ev)
      .select("n_match", "best_dist", "best_train")
      .as[(Long, Option[Long], Option[Long])].head()
    assert(got._1 >= 1L, s"planted paraphrase missed: $got")
    assert(got._2.contains(1L) && got._3.contains(tr(0)),
      s"best match should be the 1-edit neighbor ${tr(0)}: $got")
  }

  test("q209: separable two-language corpus classifies the held-out " +
    "docs perfectly") {
    val trA = idsWhere("nb:", _ < 18, 8)
    val vaA = idsWhere("nb:", _ >= 18, 2)
    val docs =
      trA.take(4).map(id => (id, "xx yy xx zz", "aa")) ++
        trA.drop(4).map(id => (id, "pp qq rr pp", "bb")) ++
        Seq((vaA(0), "xx zz yy", "aa"), (vaA(1), "qq pp rr", "bb"))
    val got = queries.PipelineQueries21.defs
      .find(_.name == "q209_nb_langid").get.fn(spark, writeDocs(docs))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("aa", "aa", 1L), ("bb", "bb", 1L)),
      s"misclassified separable corpus: $got")
  }

  test("q210: when K covers the corpus the sample quantiles ARE the " +
    "exact quantiles (err == 0 at every p)") {
    val docs = (0L until 40L).map(i => (i, "x" * (10 + 7 * i.toInt), "en"))
    val got = queries.PipelineQueries21.defs
      .find(_.name == "q210_sample_quantiles").get.fn(spark, writeDocs(docs))
      .select("p_milli", "err").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(250L, 500L, 750L, 900L))
    assert(got.values.forall(_ == 0L), s"sample != exact under full K: $got")
  }
}
