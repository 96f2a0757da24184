package graft.queries

/** THE DuckDB vector-oracle fragments — one copy of the bit-identical
  * cross-engine arithmetic contract (r15 advice: the same four
  * one-liners had been pasted into every vector-oracle generator with
  * a comment promising they stay "in lockstep" by hand).
  *
  * The contract these encode, shared with the Spark kernels
  * ([[graft.ops.VectorSearch]] / [[graft.expressions.Kernels]]):
  *
  *  - floats cast to double BEFORE any arithmetic;
  *  - every reduction is a SEQUENTIAL ascending left fold (DuckDB's
  *    `list_reduce` with a 0.0 seed), matching the kernels'
  *    ascending multiply-add loop — double addition is not
  *    associative, so fold order is part of the contract;
  *  - double literals print as 17-fractional-digit scientific
  *    notation: that round-trips any finite double, and the exponent
  *    form makes DuckDB parse DOUBLE (a plain decimal literal would
  *    parse as DECIMAL and change the arithmetic).
  *
  * Per-file `private def dotSql/...` shims delegate here so existing
  * generator code reads unchanged while the arithmetic has exactly
  * one definition to harden.
  */
private[queries] object VectorOracleSql {

  /** Sequential-fold dot product of two double-list expressions. */
  def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(list_zip($a, $b), x -> x[1] * x[2])), (p, q) -> p + q)"

  def norm(a: String): String = s"sqrt(${dot(a, a)})"

  def cos(a: String, b: String): String =
    s"(${dot(a, b)} / (${norm(a)} * ${norm(b)}))"

  /** Shortest-safe double literal (see the contract above). */
  def dbl(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.17e", Double.box(x))

  /** A vector as a DuckDB double-list literal. */
  def vlit(c: Array[Double]): String =
    c.map(dbl).mkString("[", ", ", "]")

  /** Signed projection of double-list `v` onto the md5-derived
    * hyperplane `p` — replays
    * [[graft.ops.VectorSearch.planeVector]]'s coordinate formula
    * inside the same sequential fold. */
  def proj(v: String, p: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(list_zip($v, generate_series(0, len($v) - 1)), " +
      s"x -> x[1] * ((cast('0x' || substr(md5('$p:' || x[2]), 1, 8) as bigint) " +
      s"% 2001 - 1000) / 1000.0))), (p, q) -> p + q)"
}
