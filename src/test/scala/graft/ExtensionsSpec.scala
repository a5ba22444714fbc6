package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions route must expose the same functions as the
  * runtime registry route, and the injected optimizer rule must fire.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // isolated session with the extensions installed via config, as a
    // cluster would: spark.sql.extensions=graft.functions.GraftExtensions
    val shared = SparkTestBase.spark // ensure the shared context exists first
    // getOrCreate returns the existing default session (ignoring extensions);
    // clear it so a NEW session is built over the same context with the
    // extensions installed, then restore the shared default for other suites.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions: the programmatic route (the `spark.sql.extensions`
    // config route needs the class name in the SparkContext conf, i.e. a
    // fresh JVM — exercised via spark-submit in the verify drive).
    val ext = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    ext
  }

  test("functions resolve through spark.sql.extensions injection") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    df.createOrReplaceTempView("v_ext")
    val out = spark.sql("SELECT graft_long_dot(a, b) AS d, graft_sq_norm(a) AS n FROM v_ext")
      .collect().head
    assert(out.getAs[Long]("d") == 4 + 10 + 18)
    assert(out.getAs[Long]("n") == 1 + 4 + 9)
    // the FULL function set must resolve via the extensions route — a
    // registry/extensions drift here strands config-only clusters
    val all = spark.sql(
      """SELECT
        |  graft_sorted_jaccard(array('a','b'), array('a')) AS sj,
        |  graft_sorted_long_jaccard(array(1L, 2L), array(1L)) AS slj,
        |  graft_count_in_set(array('x','y'), array('x')) AS cis,
        |  graft_minhash(array('a','b'), 4, 42) AS mh,
        |  graft_projbits(array(10L, -20L), 3, 7) AS pb""".stripMargin).collect().head
    assert(all.getAs[Double]("sj") == 0.5 && all.getAs[Double]("slj") == 0.5)
    assert(all.getAs[Int]("cis") == 1)
    assert(all.getSeq[Long](all.fieldIndex("mh")).length == 4)
  }

  test("graft_count_in_set rejects a non-constant set at analysis time") {
    import spark.implicits._
    Seq((Array("a"), Array("b"))).toDF("x", "y").createOrReplaceTempView("v_cis")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_count_in_set(x, y) FROM v_cis").collect()
    }
    assert(e.getMessage.contains("constant array"))
  }

  test("ngram and intersect functions resolve through the extensions route") {
    import spark.implicits._
    Seq(("a b c d", "b c d e f")).toDF("x", "y").createOrReplaceTempView("v_ng")
    val r = spark.sql(
      """SELECT graft_ngrams(split(x, ' '), 2) AS gx,
        |  graft_sorted_intersect(array_sort(split(x, ' ')), array_sort(split(y, ' '))) AS si,
        |  graft_sorted_long_intersect(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS sl,
        |  graft_char_ngrams('abcd', 3) AS cg
        |FROM v_ng""".stripMargin).collect()(0)
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(r.getInt(1) == 3) // b, c, d
    assert(r.getInt(2) == 2) // 3, 5
    assert(r.getSeq[String](3) == Seq("abc", "bcd"))
  }

  test("the extensions route also installs the native top-k rule + strategy") {
    // a MARKED rank filter must plan the heap operator in the extensions
    // session WITHOUT any runtime GraftPlans.install call
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val marked = orders
      .withColumn(graft.plans.GraftPlans.RankMarker, row_number().over(w))
      .filter(col(graft.plans.GraftPlans.RankMarker) <= 3)
    val plan = marked.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerGroup"), plan)
    assert(marked.count() > 0)
  }

  test("SimplifySelfSimilarity rewrites self-dot to sq-norm and self-jaccard to 1.0") {
    // file-backed source so the optimizer can't collapse the plan into a
    // pre-evaluated LocalRelation before the rewrite is observable
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("transform(embedding, x -> CAST(x * 100 AS BIGINT)) AS a")
      .createOrReplaceTempView("v_self")
    val dq = spark.sql("SELECT graft_long_dot(a, a) AS d FROM v_self")
    val plan = dq.queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("sqnorm"), s"expected self-dot rewritten to sq-norm, got:\n$plan")
    val jq = spark.sql("SELECT graft_sorted_long_jaccard(a, a) AS j FROM v_self")
    val jplan = jq.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!jplan.contains("jaccard"), s"self-jaccard should fold away:\n$jplan")
    assert(jq.limit(5).collect().forall(_.getDouble(0) == 1.0))
  }
}
