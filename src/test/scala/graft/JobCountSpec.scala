package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph, RoundTrace}

/** Pins the ONE-ACTION-PER-ROUND contract of the observe-fused iterative
  * loops (round-8's §8.9#12 device: convergence metrics ride the
  * checkpoint job via `observe()`). Until now that property was measured
  * prose — a refactor reintroducing a separate per-round count scan would
  * silently re-add a full action of scheduling overhead per round
  * (measured ~40% of small-graph round cost when the CC loop had it).
  *
  * Granularity: SQL EXECUTIONS, not raw scheduler jobs — Spark 4's eager
  * `localCheckpoint` internally submits two scheduler jobs (a
  * CollectMetrics-scoped materialization plus the checkpoint pass) under
  * ONE execution id, which is an engine constant we don't own. What the
  * fusion guarantees — and what a regression would break — is that a
  * round issues exactly ONE SQL execution: the checkpoint carrying the
  * observed metrics, with no second action for convergence.
  *
  * Device: run the operator on two inputs whose ROUND counts differ
  * (witnessed by [[RoundTrace]]), counting distinct execution ids around
  * each run. Setup executions (edge materialization, initial checkpoints)
  * are identical for both, so
  *   executions(B) − executions(A) == rounds(B) − rounds(A)
  * holds iff the marginal round costs exactly one action.
  */
class JobCountSpec extends SparkTestBase {

  private def countExecutions(body: => Unit): Int = {
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.root.id")))
          .foreach { id => ids.add(id); () }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { body; org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    ids.size()
  }

  private def pathGraph(n: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    (nodes, edges)
  }

  /** Assert the marginal round costs exactly one SQL execution for `run`
    * over a small vs a larger path graph. Both round counts must actually
    * differ or the delta proves nothing.
    */
  private def assertOneActionPerRound(op: String, small: Int, big: Int)
                                     (run: Int => Unit): Unit = {
    val execA = countExecutions(run(small))
    val roundsA = RoundTrace(op)
    val execB = countExecutions(run(big))
    val roundsB = RoundTrace(op)
    assert(roundsA > 0 && roundsB > roundsA,
      s"$op rounds must differ to pin the delta: $roundsA vs $roundsB")
    assert(execB - execA == roundsB - roundsA,
      s"$op marginal round must cost exactly ONE SQL execution: " +
        s"executions $execA→$execB (+${execB - execA}) for rounds " +
        s"$roundsA→$roundsB (+${roundsB - roundsA}) — a separate per-round " +
        "scan crept back in")
  }

  test("connectedComponents: one action per round (observe-fused convergence)") {
    // both sizes converge in < 5 rounds, below the broadcast-switch probe,
    // so the marginal cost is purely the per-round shape
    assertOneActionPerRound("cc", 2, 4) { n =>
      val (nodes, edges) = pathGraph(n)
      Dedup.connectedComponents(nodes, edges).count()
      ()
    }
  }

  test("kCore: one action per round (fused keep-list + observed count)") {
    assertOneActionPerRound("kcore", 7, 15) { n =>
      val (_, edges) = pathGraph(n)
      // k=2 over a path peels one endpoint pair per round until empty —
      // round count grows with n, deterministic
      Graph.kCore(edges, k = 2).count()
      ()
    }
  }

  test("shortestPathsInt: one action per round (witness fused into the checkpoint)") {
    import spark.implicits._
    assertOneActionPerRound("sssp", 4, 8) { n =>
      val (_, edges) = pathGraph(n)
      val w = edges.withColumn("w", lit(1L))
      Graph.shortestPathsInt(w, Seq(0L).toDF("node"), maxRounds = 32).count()
      ()
    }
  }
}
