package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level versions of the SQL-expressible codecs — pure builtin
  * compositions (codegen'd, oracle-reproducible). The non-SQL codecs
  * (base58, animal names) stay Scala-side in [[Codecs]] with unit
  * tests; they are plan-time functions for fixtures/keys, not row-hot
  * query operators.
  */
object CodecColumns {

  /** base64url without padding of a UTF-8 string column —
    * `?BIN_TO_B64` (ref: src/be_db_follower.hrl:4).
    */
  def base64Url(s: Column): Column =
    regexp_replace(translate(base64(s.cast("binary")), "+/", "-_"), "=+$", "")

  /** H3 parent (ref: src/be_db_gateway.erl:233-237): set the resolution
    * field (bits 52-55) and fill digits below the parent resolution with
    * 7. Input/output as unsigned 64-bit longs (valid H3 indexes have bit
    * 63 clear).
    */
  def h3ParentLong(h: Column, parentRes: Int): Column = {
    val res = call_function("shiftright", h, lit(52)).bitwiseAND(0xFL)
    val cleared = h.bitwiseAND(lit(~(0xFL << 52)))
      .bitwiseOR(lit(parentRes.toLong << 52))
    // digits parentRes+1 .. res -> 7 (3 bits each at 45-3r)
    (parentRes + 1 to 15).foldLeft(cleared) { (acc, r) =>
      when(res >= r, acc.bitwiseOR(lit(0x7L << (45 - 3 * r)))).otherwise(acc)
    }
  }

  /** Parse an H3 hex-string column to its long form. */
  def h3FromHex(s: Column): Column = conv(s, 16, 10).cast("long")

  /** DuckDB twin of [[h3ParentLong]] over a BIGINT-typed expression
    * `h` — ONE definition for every oracle that mirrors the parent
    * math (q42, q67), so the bit constants cannot drift apart.
    */
  def h3ParentSql(h: String, parentRes: Int): String = {
    val cleared = s"(($h & ${~(0xFL << 52)}) | ${parentRes.toLong << 52})"
    (parentRes + 1 to 15).map(r =>
      s"(CASE WHEN (($h >> 52) & 15) >= $r " +
        s"THEN ${0x7L << (45 - 3 * r)} ELSE 0 END)")
      .mkString(s"$cleared | ", " | ", "")
  }

  /** Subnet base of a 48-bit `<<base:25, mask:23>>` packed value
    * (ref: src/be_db_oui.erl:100-102).
    */
  def subnetBase(subnet: Column): Column =
    call_function("shiftright", subnet, lit(23)).bitwiseAND(0x1FFFFFFL)

  /** Subnet mask of the packed value. */
  def subnetMask(subnet: Column): Column = subnet.bitwiseAND(0x7FFFFFL)
}
