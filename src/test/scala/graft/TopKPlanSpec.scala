package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The native grouped top-k stack (Rule → custom LogicalPlan → Strategy →
  * heap SparkPlan) must be plan-visible AND result-identical to the window
  * form under the same total-order contract.
  */
class TopKPlanSpec extends SparkTestBase {

  private def orders = Tables(spark, sf(), "orders")

  private def windowForm(k: Int) =
    Relational
      .topKPerGroup(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))

  private def nativeForm(k: Int) =
    Relational
      .topKPerGroupNative(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))

  test("native == window for k below, at, and above group sizes") {
    for (k <- Seq(1, 3, 1000)) {
      val w = windowForm(k).collect().map(_.toString).toSeq
      val n = nativeForm(k).collect().map(_.toString).toSeq
      assert(n == w, s"k=$k differs: native=${n.take(3)} window=${w.take(3)}")
    }
  }

  test("plan uses the heap operator: no Window, no partition sort") {
    val p = nativeForm(3).queryExecution.executedPlan.toString()
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("windowspecdefinition"), p)
    // the only Sort allowed is the final presentation orderBy ABOVE the
    // operator — no sort may feed the heap
    val topkIdx = p.indexOf("TopKPerGroup")
    assert(!p.substring(topkIdx).contains("Sort ["), p)
  }

  test("global top-k (no partition columns) goes through AllTuples") {
    val w = Relational
      .topKPerGroup(orders, Seq.empty, Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
      .select(col("o_orderkey"), col("rn")).orderBy(col("rn"))
      .collect().map(_.toString).toSeq
    val n = Relational
      .topKPerGroupNative(orders, Seq.empty, Seq(col("o_totalprice").desc, col("o_orderkey").asc), 5)
      .select(col("o_orderkey"), col("rn")).orderBy(col("rn"))
      .collect().map(_.toString).toSeq
    assert(n == w)
  }

  test("unmarked rank-filter windows are NOT rewritten") {
    val p = windowForm(3).queryExecution.executedPlan.toString()
    assert(!p.contains("TopKPerGroup"), p)
  }
}
