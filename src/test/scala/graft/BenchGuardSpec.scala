package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-regression gate, unit-tested on synthetic bench lines —
  * no Spark session needed. The contract the judge review used to check by
  * hand: a >2x steady-state slowdown in any query must trip the guard, a
  * clean (or noisy-but-under-threshold) run must not.
  */
class BenchGuardSpec extends AnyFunSuite {

  private val prevLine =
    """{"queries":{"q01_agg":0.5,"q85_cascade":4.1,"q76_fast":0.08,"q13_broken":-1.0},""" +
      """"noise":{"q85_cascade":{"pass1":4.9,"pass2":4.1}},"sf":"/x","metric":"total","unit":"sec","value":9.0}"""

  test("parseQueries reads the machine-written bench line exactly") {
    val q = BenchCompare.parseQueries(prevLine)
    assert(q == Map("q01_agg" -> 0.5, "q85_cascade" -> 4.1, "q76_fast" -> 0.08,
      "q13_broken" -> -1.0))
    // the noise block's nested objects must not leak into the query map
    assert(!q.contains("pass1"))
    assert(BenchCompare.parseQueries("no queries here") == Map.empty)
  }

  test("an intentional 3x slowdown trips the guard; a clean run does not") {
    val prev = BenchCompare.parseQueries(prevLine)
    // clean run: same times with +-20% jitter — no regression
    val clean = Map("q01_agg" -> 0.6, "q85_cascade" -> 3.6, "q76_fast" -> 0.1)
    assert(BenchCompare.regressions(prev, clean).isEmpty)
    // q85 3x slower: tripped, with the factor attributed
    val slow = clean.updated("q85_cascade", 12.3)
    val hits = BenchCompare.regressions(prev, slow)
    assert(hits.map(_._1) == Seq("q85_cascade"), s"got $hits")
    assert(hits.head._2 == 4.1 && hits.head._3 == 12.3)
  }

  test("floors and failure sentinels are exempt, new queries pass through") {
    val prev = BenchCompare.parseQueries(prevLine)
    // q76: 0.08 s -> 0.25 s is 3x but under the 0.3 s floor (scheduling noise)
    assert(BenchCompare.regressions(prev, Map("q76_fast" -> 0.25)).isEmpty)
    // ...and over the floor it counts
    assert(BenchCompare.regressions(prev, Map("q76_fast" -> 0.4)).nonEmpty)
    // a query that FAILED last round (-1) is not a regression baseline
    assert(BenchCompare.regressions(prev, Map("q13_broken" -> 5.0)).isEmpty)
    // a query failing NOW (-1) is a correctness problem, not a regression
    assert(BenchCompare.regressions(prev, Map("q85_cascade" -> -1.0)).isEmpty)
    // a brand-new query has no baseline — never tripped
    assert(BenchCompare.regressions(prev, Map("q999_new" -> 60.0)).isEmpty)
  }

  test("guard hits self-adjudicate: the entry carries a solo re-measure") {
    val prev = BenchCompare.parseQueries(prevLine)
    val slow = Map("q85_cascade" -> 12.3, "q01_agg" -> 0.6)
    var soloRuns = List.empty[String]
    val json = BenchCompare.regressionJson(prev, slow, q => { soloRuns ::= q; Some(4.5) })
    // only the flagged query was re-measured, and both factors are in-file
    assert(soloRuns == List("q85_cascade"))
    assert(json ==
      """[{"query":"q85_cascade","prev":4.1,"cur":12.3,"factor":3.0,"solo":4.5,"solo_factor":1.098}]""")
    // a solo re-run that CRASHES records the failure, not its time-to-fail
    assert(BenchCompare.regressionJson(prev, slow, _ => None) ==
      """[{"query":"q85_cascade","prev":4.1,"cur":12.3,"factor":3.0,"solo":null,"solo_factor":null,"solo_error":true}]""")
    // a clean run emits an empty array and never invokes the solo pass
    var ran = false
    assert(BenchCompare.regressionJson(prev, Map("q01_agg" -> 0.6),
      _ => { ran = true; Some(0.0) }) == "[]")
    assert(!ran)
  }

  test("cross-SF baselines are detected via the sf field") {
    assert(BenchCompare.parseSf(prevLine).contains("/x"))
    assert(BenchCompare.parseSf("{}").isEmpty)
  }
}
