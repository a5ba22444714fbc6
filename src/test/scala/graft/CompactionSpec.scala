package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{BloomSkipping, Compaction, Skipping}

/** Small-file compaction: bin-packing reduces the file count, preserves
  * every row, never crosses a partition directory, never rewrites
  * well-sized files, is idempotent, and leaves both side-indexes
  * (stats manifest, bloom index) fresh and engaged.
  */
class CompactionSpec extends SparkTestBase {

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-compact-$tag").toFile
    d.deleteOnExit()
    d.toString
  }

  private def fs(root: String) =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def files(root: String): Seq[(String, Long)] =
    Skipping.listDataFiles(fs(root), new HPath(root))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def fragmented(tag: String, nFiles: Int = 24): String = {
    val root = tmpDir(tag)
    spark.range(0, 6000).toDF("id")
      .withColumn("v", col("id") * 3 % 101)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(root)
    root
  }

  test("compaction reduces file count, preserves every row and value") {
    val root = fragmented("basic")
    val before = files(root)
    val rowsBefore = sortedRows(spark.read.parquet(root))
    val total = before.map(_._2).sum
    val rep = Compaction.compact(spark, root, targetBytes = total / 4 + 1)
    assert(rep.binsCompacted >= 1)
    assert(rep.filesAfter < rep.filesBefore,
      s"must reduce files: ${rep.filesBefore} -> ${rep.filesAfter}")
    assert(rep.filesAfter <= 6, s"24 tiny files at quarter-target should land <=6, got ${rep.filesAfter}")
    assert(sortedRows(spark.read.parquet(root)) == rowsBefore)
  }

  test("well-sized files are not rewritten; compaction is idempotent") {
    val root = fragmented("idem")
    val total = files(root).map(_._2).sum
    Compaction.compact(spark, root, targetBytes = total / 4 + 1)
    val afterFirst = files(root)
    val rep2 = Compaction.compact(spark, root, targetBytes = total / 4 + 1)
    // second pass: the compacted files are near-target and a lone small
    // remainder has no partner — nothing to do, nothing touched
    assert(rep2.binsCompacted == 0 || rep2.bytesRewritten < total / 4,
      "second compaction must not rewrite the table")
    if (rep2.binsCompacted == 0)
      assert(files(root) == afterFirst, "no-op must leave files untouched")
  }

  test("bins never cross a partition directory; partition values survive") {
    val root = tmpDir("part")
    spark.range(0, 4000).toDF("id")
      .withColumn("k", (col("id") % 4).cast("string"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("k").parquet(root)
    val rowsBefore = sortedRows(spark.read.parquet(root))
    val total = files(root).map(_._2).sum
    val rep = Compaction.compact(spark, root, targetBytes = total + 1)
    assert(rep.filesAfter < rep.filesBefore)
    // one bin per partition dir at this target ⇒ exactly 4 files, one per k
    assert(rep.filesAfter == 4, s"expected one file per partition, got ${rep.filesAfter}")
    val byDir = files(root).map(_._1.split('/').head).distinct.sorted
    assert(byDir == Seq("k=0", "k=1", "k=2", "k=3"))
    assert(sortedRows(spark.read.parquet(root)) == rowsBefore,
      "partition-derived values must survive compaction")
  }

  test("stats manifest and bloom index stay fresh and engaged after compaction") {
    val root = fragmented("indexes")
    Skipping.writeManifest(spark, root, Seq("id", "v"))
    BloomSkipping.writeBloomIndex(spark, root, Seq("id"))
    val total = files(root).map(_._2).sum
    Compaction.compact(spark, root, targetBytes = total / 4 + 1)
    val pr = Skipping.readPrunedDetailed(spark, root, "id = 599")
    assert(pr.fallback.isEmpty, s"manifest must be fresh: ${pr.fallback}")
    assert(pr.statsSelected >= 0, "bloom index must be fresh and consulted")
    assert(pr.df.count() == 1)
  }

  test("a crashed run's staging leftovers are invisible and swept by the next run") {
    val root = fragmented("crash")
    val f = fs(root)
    val staging = new HPath(new HPath(root), ".graft-compact-staging/bin-0")
    f.mkdirs(staging)
    val out = f.create(new HPath(staging, "part-junk.parquet"), true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    // hidden: a plain read must not see it
    val rowsBefore = sortedRows(spark.read.parquet(root))
    val total = files(root).map(_._2).sum
    val rep = Compaction.compact(spark, root, targetBytes = total / 4 + 1)
    assert(rep.filesAfter < rep.filesBefore)
    assert(!f.exists(new HPath(new HPath(root), ".graft-compact-staging")),
      "staging must be swept")
    assert(sortedRows(spark.read.parquet(root)) == rowsBefore)
  }

  test("a crash between commit rename and source deletes is RECOVERED, not baked in") {
    // simulate the half-commit the journal exists for: the compacted file
    // is already visible AND its sources are still live (duplicates), and
    // the journal records the intent. The next compact() must finish the
    // deletes BEFORE re-packing — without recovery the duplicate rows
    // would survive every subsequent pack, permanently inflating counts.
    val root = fragmented("halfcommit", nFiles = 8)
    val f = fs(root)
    val rowsWant = sortedRows(spark.read.parquet(root))
    val before = files(root)
    // build a real compacted twin of two source files, made visible
    val victims = before.take(2)
    val dupDir = tmpDir("halfcommit-dup")
    spark.read.parquet(victims.map { case (rel, _) => s"$root/$rel" }: _*)
      .coalesce(1).write.mode("overwrite").parquet(dupDir)
    val produced = f.listStatus(new HPath(dupDir))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")).head
    val destRel = "part-gcompact-testdup.parquet"
    f.rename(produced.getPath, new HPath(new HPath(root), destRel))
    // duplicates are now live: the table double-counts the victims' rows
    val victimRows =
      spark.read.parquet(victims.map { case (rel, _) => s"$root/$rel" }: _*).count()
    assert(spark.read.parquet(root).count() == rowsWant.size + victimRows)
    // the journal that a crashed run would have left behind
    val commits = new HPath(new HPath(root), ".graft-compact-commits")
    f.mkdirs(commits)
    val out = f.create(new HPath(commits, "commit-0.txt"), true)
    out.write((destRel +: victims.map(_._1)).mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
    val total = files(root).map(_._2).sum
    Compaction.compact(spark, root, targetBytes = total / 4 + 1)
    assert(!f.exists(commits), "journals must be consumed")
    assert(sortedRows(spark.read.parquet(root)) == rowsWant,
      "recovery must delete the journaled sources — duplicates never bake in")
  }

  test("q362 gate artifact compacts and matches the source at sf0.001") {
    val df = SparkEntry.queries("q362_compaction")(spark, sf())
    assert(df.count() > 0)
  }

  test("evolved schemas in one bin survive compaction (no silent column drop)") {
    val root = tmpDir("evolve")
    // two generations of tiny files: the older lacks column `extra` — a
    // bin read without mergeSchema samples ONE file's schema and would
    // permanently drop whichever column set the sample misses
    spark.range(0, 100).toDF("id")
      .repartition(3).write.mode("overwrite").parquet(root)
    spark.range(100, 200).toDF("id").withColumn("extra", col("id") * 7)
      .repartition(3).write.mode("append").parquet(root)
    val want = sortedRows(
      spark.read.option("mergeSchema", "true").parquet(root).select("id", "extra"))
    val total = files(root).map(_._2).sum
    val rep = Compaction.compact(spark, root, targetBytes = total + 1)
    assert(rep.binsCompacted >= 1, "the six tiny files must form a bin")
    val after = spark.read.option("mergeSchema", "true").parquet(root)
    assert(after.columns.toSet == Set("id", "extra"),
      s"compacted output lost a column: ${after.columns.mkString(",")}")
    assert(sortedRows(after.select("id", "extra")) == want,
      "every (id, extra) value must survive compaction across evolved schemas")
  }
}
