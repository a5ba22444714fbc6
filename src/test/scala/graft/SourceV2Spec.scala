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

  // --------------------- graft-parquet: planner-integrated skipping (r11)

  import org.apache.spark.sql.DataFrame
  import graft.etl.{BloomSkipping, Skipping}
  import graft.sources.{GraftFileIndex, GraftParquetSource}

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-v2-$tag").toFile
    d.deleteOnExit()
    d.toString
  }

  /** 8 files, id round-robin-scattered (min/max on id prune nothing), a
    * band column whose ranges DO prune, manifest + bloom stamped.
    */
  private def stampedLayout(tag: String): String = {
    val root = tmpDir(tag)
    spark.range(0, 8000).toDF("seq")
      .select((col("seq") * 2).as("id"),
        (col("seq") % 8).cast("int").as("band"),
        concat(lit("v"), col("seq")).as("payload"))
      .repartitionByRange(8, col("band"))
      .write.mode("overwrite").parquet(root)
    Skipping.writeManifest(spark, root, Seq("id", "band"))
    BloomSkipping.writeBloomIndex(spark, root, Seq("id"))
    root
  }

  test("graft-parquet: rows equal plain parquet; stats+bloom prune the listing") {
    val root = stampedLayout("basic")
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    // range predicate on the clustered column: stats prune
    val pred = "band >= 2 AND band <= 3"
    val v2 = GraftParquetSource.read(spark, root).filter(pred)
    assert(rows(v2) == rows(spark.read.parquet(root).filter(pred)))
    val (total, statsKept, kept) = prune(root)
    assert(total == spark.read.parquet(root).inputFiles.length && kept < total,
      s"stats pruning must engage through the planner: $kept/$statsKept/$total")
    // equality on the scattered key: stats keep everything, blooms prune
    val eqPred = "id = 4000"
    val v2eq = GraftParquetSource.read(spark, root).filter(eqPred)
    assert(rows(v2eq) == rows(spark.read.parquet(root).filter(eqPred)))
    val (t2, s2, k2) = prune(root)
    assert(k2 < s2,
      s"bloom stage must prune beyond stats through the planner: $k2/$s2/$t2")
    assert(v2eq.count() == 1)
  }

  private def prune(root: String): (Int, Int, Int) = GraftFileIndex.pruneFor(root)

  test("graft-parquet: pruned files never become InputPartitions") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    val root = stampedLayout("parts")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = GraftParquetSource.read(spark, root).filter("id = 4000")
      df.count()
      val scans = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b
      }
      assert(scans.nonEmpty, "expected a BatchScanExec for the V2 read")
      val plannedFiles = scans.flatMap(_.inputRDD.partitions).flatMap {
        p => p.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition]
          .inputPartitions.flatMap {
            case fp: FilePartition => fp.files.map(_.urlEncodedPath)
            case _ => Seq.empty
          }
      }.distinct
      val totalFiles = spark.read.parquet(root).inputFiles.length
      val (_, _, kept) = prune(root)
      assert(plannedFiles.size == kept,
        s"InputPartitions must carry exactly the surviving files: " +
          s"${plannedFiles.size} vs $kept")
      assert(plannedFiles.size < totalFiles,
        s"pruned files must never be planned: ${plannedFiles.size}/$totalFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("graft-parquet: a stale side index degrades to a full scan, rows stay right") {
    import org.apache.spark.sql.functions.{col => c}
    val root = stampedLayout("stale")
    // out-of-band append: manifest and bloom both drift
    spark.range(0, 10).toDF("seq")
      .select((c("seq") + 100000).as("id"), lit(2).cast("int").as("band"),
        lit("late").as("payload"))
      .coalesce(1).write.mode("append").parquet(root)
    val pred = "band = 2"
    val v2 = GraftParquetSource.read(spark, root).filter(pred)
    assert(v2.collect().map(_.toString).sorted.toSeq ==
      spark.read.parquet(root).filter(pred).collect().map(_.toString).sorted.toSeq,
      "stale indexes must cost performance only, never rows")
    val (total, statsKept, kept) = prune(root)
    assert(kept == total, s"stale index must disable pruning: $kept/$total")
  }

  test("graft-parquet: partition-dir pruning composes with stats pruning") {
    val root = tmpDir("partdirs")
    spark.range(0, 4000).toDF("seq")
      .select(col("seq").as("id"), (col("seq") % 4).cast("int").as("p"),
        (col("seq") % 16).cast("int").as("band"))
      .repartitionByRange(16, col("p"), col("band"))
      .write.partitionBy("p").mode("overwrite").parquet(root)
    Skipping.writeManifest(spark, root, Seq("band"))
    val pred = "p = 1 AND band <= 3"
    val v2 = GraftParquetSource.read(spark, root).filter(pred)
    assert(v2.collect().map(_.toString).sorted.toSeq ==
      spark.read.parquet(root).filter(pred).collect().map(_.toString).sorted.toSeq)
    val (total, _, kept) = prune(root)
    // total here is already partition-dir-pruned (p=1 only); stats must
    // then prune within the partition
    assert(kept < total, s"stats must prune within the partition: $kept/$total")
    val allFiles = spark.read.parquet(root).inputFiles.length
    assert(total < allFiles, s"partition dirs must prune first: $total/$allFiles")
  }
}
