package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract meta-pins: the driver's correctness gate silently
  * degrades to a rows-only check for any query without an oracle, so
  * a QDef added without one would LOOK green while being barely
  * checked — fail CI instead.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every declared query name is unique and follows qNN_snake") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size === names.distinct.size)
    val bad = names.filterNot(_.matches("^q\\d+_[a-z0-9_]+$"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("every declared query carries a DuckDB oracle (static or " +
    "late-bound)") {
    // late-bound oracles resolve only after their query runs; the
    // QDef-level check is that SOME oracle source exists per def
    val missing = SparkEntry.allDefs
      .filter(d => d.oracle.isEmpty && d.oracleLate.isEmpty)
      .map(_.name)
    assert(missing.isEmpty,
      s"queries with NO oracle source (driver degrades silently): " +
        s"${missing.sorted}")
  }
}
