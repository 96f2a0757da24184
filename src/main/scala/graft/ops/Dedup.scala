package graft.ops

import graft.functions.TextAnalysis._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup is one hash aggregation on the content
  * hash. Near-dup detection is MinHash-LSH — linear signature pass, then
  * a shuffle keyed on (band, bandValue) so only docs sharing a band ever
  * meet. The exact-Jaccard verification runs only on candidate pairs,
  * never on the full cross product: at 100 TB the candidate set is
  * O(n·dup_rate), not O(n²).
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct content with the
    * canonical (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** MinHash-LSH near-duplicate pairs with exact Jaccard verification.
    *
    * @param numHashes total minhash functions (numBands * rowsPerBand)
    * @param threshold keep pairs with shingle-set Jaccard >= threshold
    *
    * With r=2, b=8 the miss probability for a true pair at s=0.8 is
    * (1-s^2)^b ≈ 0.36^8 ≈ 3e-4 and ~1e-6 at the s≥0.9 regime planted
    * dups live in; candidates below threshold are filtered exactly.
    */
  def nearDupMinhash(docs: DataFrame, idCol: String, textCol: String,
                     numBands: Int = 8, rowsPerBand: Int = 2,
                     threshold: Double = 0.8): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val withSh = docs.select(col(idCol).as("doc_id"),
        shingles3(tokens(col(textCol))).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = withSh.withColumn("mh", minhash(col("sh"), numHashes))
    // band value = concat of its rowsPerBand minhashes
    val bands = sig.select(col("doc_id"), explode(
      transform(sequence(lit(0), lit(numBands - 1)), k =>
        struct(k.as("band"), concat_ws("|",
          (0 until rowsPerBand).map(r =>
            element_at(col("mh"), k * rowsPerBand + r + 1)): _*).as("bv"))))
      .as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bv"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val a = withSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs: hamming distance <= maxDist over the 32-bit
    * simhash. Blocked on the four 8-bit bytes: by pigeonhole, two hashes
    * within hamming distance 3 agree exactly on at least one byte, so the
    * self-join only meets inside byte-value buckets — O(n·bucket), never
    * the full cross product.
    */
  def nearDupSimhash(docs: DataFrame, idCol: String, textCol: String,
                     maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-byte blocking guarantees recall only to distance 3")
    val sh = docs.select(col(idCol).as("doc_id"),
      simhash32(tokens(col(textCol))).as("simhash"))
    val blocked = sh.select(col("doc_id"), col("simhash"), explode(
      transform(sequence(lit(0), lit(3)), k =>
        struct(k.as("blk"),
          call_function("shiftright", col("simhash"), k * 8)
            .bitwiseAND(255).as("key"))))
      .as("e"))
      .select(col("doc_id"), col("simhash"), col("e.blk"), col("e.key"))
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming(col("x.simhash"), col("y.simhash")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
