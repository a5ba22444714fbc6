package graft

import org.apache.spark.sql.functions._

/** The graft-range DataSource V2 connector: correctness against the
  * spark.range reference, and the two pushdowns actually reaching the scan
  * (bounds tightened in the scan description; label column absent when
  * pruned).
  */
class SourceV2Spec extends SparkTestBase {

  private def src(n: Long, slices: Int = 4) =
    spark.read.format("graft.sources.RangeSource")
      .option("n", n.toString).option("slices", slices.toString).load()

  test("rows equal the computed reference, across slice counts") {
    import spark.implicits._
    for (slices <- Seq(1, 3, 8)) {
      val got = src(100, slices)
        .select("id", "square", "bucket", "label")
        .as[(Long, Long, Int, String)].collect().sortBy(_._1)
      val want = (0L until 100L).map(i => (i, i * i, (i % 16).toInt, s"row-$i"))
      assert(got.toSeq == want, s"slices=$slices")
    }
  }

  test("range predicates are absorbed into the generated bounds") {
    val scan = src(1000)
      .filter(col("id") >= 100 && col("id") < 300)
      .queryExecution.executedPlan.toString
    // the scan description carries the tightened interval — proof the
    // filter deleted work at the source rather than post-filtering 1000 rows
    assert(scan.contains("graft-range [100, 300)"), s"bounds not pushed:\n$scan")
    assert(src(1000).filter(col("id") >= 100 && col("id") < 300).count() == 200)
    // an equality predicate collapses the interval to one row
    val eq = src(1000).filter(col("id") === 42)
    assert(eq.queryExecution.executedPlan.toString.contains("graft-range [42, 43)"))
    assert(eq.count() == 1)
    // a contradictory range yields an empty interval, zero partitions of work
    assert(src(1000).filter(col("id") > 500 && col("id") < 100).count() == 0)
  }

  test("column pruning reaches the reader schema") {
    val scan = src(1000).select(col("bucket"))
      .queryExecution.executedPlan.toString
    assert(scan.contains("cols=bucket"), s"pruning did not reach the scan:\n$scan")
    // residual (non-id) filters stay with Spark and still evaluate correctly
    assert(src(100).filter(col("bucket") === 3).count() == 7) // 3,19,...,99
  }

  test("micro-batch stream read equals the batch read") {
    import graft.streaming.StreamOps
    import org.apache.spark.sql.streaming.OutputMode
    val stream = spark.readStream.format("graft.sources.RangeSource")
      .option("n", "5000").option("slices", "6").load()
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("square")).as("sum_square"))
    val got = StreamOps.runToMemory(spark, stream, "v2stream", OutputMode.Complete())
      .orderBy(col("bucket")).collect().map(_.toSeq)
    val want = src(5000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("square")).as("sum_square"))
      .orderBy(col("bucket")).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("counting sink aggregates task commit messages on the driver") {
    import graft.sources.CountingSink
    src(12345, slices = 8)
      .write.format("graft.sources.CountingSink")
      .option("tag", "v2spec").mode("append").save()
    assert(CountingSink.total("v2spec") == 12345L)
    // a second write with a different partition layout replaces the total
    src(77, slices = 3).repartition(5)
      .write.format("graft.sources.CountingSink")
      .option("tag", "v2spec").mode("append").save()
    assert(CountingSink.total("v2spec") == 77L)
    assert(CountingSink.total("never-written") == -1L)
  }
}
