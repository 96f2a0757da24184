package graft.ops

import graft.functions.TextAnalysis._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking at token granularity (the LBFS/FastCDC
  * anchor rule, simplified to a single-token predicate): a chunk
  * boundary opens at every token whose 32-bit hash ≡ 0 (mod
  * `modulus`). Boundaries depend only on LOCAL content, so an edit
  * re-chunks its own neighborhood instead of shifting every
  * downstream chunk the way fixed-width segmentation does —
  * CdcChunksSpec pins that edit-locality property. Expected chunk
  * length ≈ `modulus` tokens.
  *
  * Plan shape: posexplode_outer + null-guard (the lesson-#7 generate
  * idiom), ONE window partitioned by doc id (bounded by a document's
  * length — the q101 class, never corpus-wide), then a per-(doc,
  * chunk) aggregation whose ordered reassembly is bounded by one
  * chunk. Chunk identity is the 60-BIT hash (Sketches.hash60) of the
  * space-joined tokens — downstream sharing joins carry longs, never
  * chunk text, and the key survives billions of distinct chunks
  * (the 32-bit tokenHash would birthday-collide near 77k; it is
  * still used for the cut predicate, which only needs a few bits).
  */
object CdcChunks {

  /** (idCol, chunk_no, ch, chunk_len) — one row per chunk. */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             modulus: Int = 16): DataFrame = {
    val t = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode_outer(col("toks")).as(Seq("pos", "tok")))
      .filter(col("tok").isNotNull)
      .select(col(idCol), col("pos"), col("tok"),
        when(tokenHash(col("tok")) % modulus === 0, 1L).otherwise(0L)
          .as("cut"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    t.withColumn("chunk_no", sum("cut").over(w))
      .groupBy(col(idCol), col("chunk_no"))
      .agg(Sketches.hash60(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ")).as("ch"),
        count(lit(1)).as("chunk_len"))
  }
}
