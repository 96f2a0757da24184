package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The (block, hash) total-order key every latest-per-key fold sorts by:
  * zero-padded height then txn hash, so lexicographic string order ==
  * (block, hash) order. One definition — the Scala producers
  * (AccountLedger, OuiLedger, the gateway/validator inventory folds)
  * and the DuckDB oracles must construct the IDENTICAL key, or
  * cross-engine `ver` comparisons silently diverge.
  */
object Ver {

  def key(block: Column, hash: Column): Column =
    concat(lpad(block.cast("string"), 12, "0"), hash)

  /** DuckDB twin of [[key]] — keep textually in sync. */
  val sql: String = "lpad(CAST(block AS VARCHAR), 12, '0') || hash"
}
