package graft

/** The driver contract itself: a typo'd or missing oracle key silently
  * downgrades that query to a rows-only check at the gate — this spec makes
  * key drift a test failure instead.
  */
class ContractSpec extends SparkTestBase {

  test("every registered query has exactly one oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the qNNN_name convention with unique numbers") {
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = SparkEntry.queries.keySet.toSeq.map {
      case pat(n) => n.toInt
      case bad => fail(s"query name breaks convention: $bad")
    }
    val dups = nums.groupBy(identity).collect { case (n, occ) if occ.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query numbers: $dups")
  }

  test("entry() produces rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
