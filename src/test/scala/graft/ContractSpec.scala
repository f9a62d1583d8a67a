package graft

/** Driver-contract invariants: the bits the correctness harness assumes
  * but nothing else would catch until a round's verify run. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle entry and every oracle names a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle (driver downgrades to rows-only): ${q -- o}")
    assert((o -- q).isEmpty, s"oracles naming no query: ${o -- q}")
  }

  test("flagship entry returns rows on the smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names follow the qNN_snake convention the driver sorts by") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }
}
