package graft

import graft.domain.{AccountLedger, OuiLedger}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Merge-algebra properties of the two ledger folds: for ANY ordered
  * partition of the transaction history into batches, the incremental
  * fold must equal the single-shot fold — the invariant the ingest
  * driver's batch boundaries rely on (the fixed 3-batch ingest case is
  * covered end-to-end in BlockIngestSpec; this spec drives the merge
  * functions directly over random splits).
  */
class LedgerMergeSpec extends SparkSpec {

  private lazy val txns =
    spark.read.parquet("/root/repo/fixtures/transactions.parquet")

  private def randomSplits(rnd: Random, maxBlock: Long, k: Int): Seq[(Long, Long)] = {
    val cuts = Seq.fill(k - 1)(rnd.nextInt(maxBlock.toInt - 1) + 1L)
      .distinct.sorted
    val bounds = (Seq(0L) ++ cuts :+ maxBlock).distinct.sorted
    bounds.zip(bounds.tail).map { case (lo, hi) => (lo + 1, hi) }
  }

  test("account fold: any batch split == single-shot (seeded random splits)") {
    val single = AccountLedger.inventory(txns)
    val rnd = new Random(31)
    (1 to 3).foreach { _ =>
      val splits = randomSplits(rnd, 60L, rnd.nextInt(4) + 2)
      val folded = splits.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        case (state, (lo, hi)) =>
          val b = AccountLedger.fold(AccountLedger.deltas(
            txns.filter(col("block").between(lo, hi))))
          Some(state match {
            case None => AccountLedger.finish(b)
            case Some(st) => AccountLedger.merge(st, b)
          })
      }.get
      assert(folded.except(single).count() === 0L, s"splits=$splits")
      assert(single.except(folded).count() === 0L, s"splits=$splits")
    }
  }

  test("oui fold: any batch split == single-shot (seeded random splits)") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("oui"), col("owner"), col("nonce"),
        to_json(col("addresses")).as("a"), to_json(col("subnets")).as("s"),
        col("first_block"), col("last_block"))
    val single = canon(OuiLedger.inventory(txns))
    val rnd = new Random(37)
    (1 to 3).foreach { _ =>
      val splits = randomSplits(rnd, 60L, rnd.nextInt(4) + 2)
      val folded = splits.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        case (state, (lo, hi)) =>
          val b = OuiLedger.fold(OuiLedger.rows(
            txns.filter(col("block").between(lo, hi))))
          Some(state match {
            case None => OuiLedger.finish(b)
            case Some(st) => OuiLedger.merge(st, b)
          })
      }.get
      assert(canon(folded).except(single).count() === 0L, s"splits=$splits")
      assert(single.except(canon(folded)).count() === 0L, s"splits=$splits")
    }
  }
}
