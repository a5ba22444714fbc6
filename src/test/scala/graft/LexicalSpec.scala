package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.ops.Lexical

/** The persisted inverted index (round-10): the index-path scorer must
  * equal the corpus-scan form cell for cell, the driver-side CRC must
  * agree with Spark's `crc32` (a disagreement would silently read the
  * WRONG shards — empty results, not an error), and shard pruning must
  * actually engage at the file-listing grain.
  */
class LexicalSpec extends SparkTestBase {

  private val terms = Seq("hash", "merge", "window", "spark", "filter", "slow")

  test("driver-side bucketOf agrees with Spark's crc32 for every queried term") {
    import spark.implicits._
    val sparkSide = terms.toDF("tok")
      .select(col("tok"), pmod(crc32(col("tok")), lit(64L)).cast("int").as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(Lexical.bucketOf(t, 64) == sparkSide(t),
        s"CRC mismatch for '$t': driver ${Lexical.bucketOf(t, 64)} vs spark ${sparkSide(t)}")
    }
  }

  test("index path hash-matches the corpus-scan form; shard pruning engages") {
    val root = Tables.lexicalIndex(spark, sf())
    val idx = Lexical.scoreBM25(spark, root, terms, k = 20)
    val scan = SparkEntry.queries("q358_bm25")(spark, sf())
    assert(idx.collect().map(_.toString).toSeq ==
      scan.collect().map(_.toString).toSeq,
      "index-path BM25 must equal the scan form cell for cell")

    // partition pruning at the listing grain: the postings scan touches
    // at most one file per queried shard, a strict subset of the index
    // (build writes one file per bucket dir). AQE off for this probe so
    // the FileSourceScanExec nodes sit in the plain executed plan — the
    // property pinned (STATIC partition pruning off the driver-side CRC)
    // is decided before AQE ever runs.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val probe = Lexical.scoreBM25(spark, root, terms, k = 20)
      probe.count()
      val scans = probe.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.toString.contains("postings") => f
      }
      assert(scans.nonEmpty, "expected a postings file scan in the executed plan")
      val shardCount = terms.map(Lexical.bucketOf(_, Lexical.DefaultBuckets)).distinct.size
      val numFiles = scans.map(_.metrics("numFiles").value).sum
      val totalFiles = spark.read.parquet(s"$root/postings").inputFiles.length
      assert(numFiles <= shardCount * scans.size,
        s"each scan must touch <= $shardCount shard files, touched $numFiles over ${scans.size} scans")
      assert(numFiles < totalFiles,
        s"pruning must drop unqueried shards: $numFiles of $totalFiles")
      val planStr = scans.head.toString
      assert(planStr.contains("PartitionFilters") && planStr.contains("bucket"),
        s"bucket filter must be a partition filter:\n$planStr")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("a term absent from the corpus scores nothing and reads at most its own shard") {
    val root = Tables.lexicalIndex(spark, sf())
    val idx = Lexical.scoreBM25(spark, root, Seq("zzz_not_a_token_zzz"), k = 5)
    assert(idx.count() == 0)
  }

  test("VSM arm ranks from the same index and genuinely disagrees with BM25") {
    val root = Tables.lexicalIndex(spark, sf())
    val vsm = Lexical.scoreTfIdfNorm(spark, root, terms, k = 20).collect()
    assert(vsm.length > 0 && vsm.length <= 20)
    // ranks are 1..k dense and deterministic
    assert(vsm.map(_.getAs[Int]("rank")).toSeq == (1 to vsm.length))
    // the two models must not be rank-identical (tf saturation + the
    // different idf bend the ordering) — if they were, fusing them would
    // be decorative
    val bm = Lexical.scoreBM25(spark, root, terms, k = 20).collect()
    assert(bm.map(_.getAs[Long]("doc_id")).toSeq !=
      vsm.map(_.getAs[Long]("doc_id")).toSeq,
      "BM25 and VSM orderings should differ on this corpus")
  }

  test("hybrid RRF fusion: every fused doc comes from an arm, two-arm docs outrank-able") {
    val df = SparkEntry.queries("q363_hybrid_retrieval")(spark, sf())
    val rows = df.collect()
    assert(rows.nonEmpty)
    val nLists = rows.map(_.getAs[Long]("n_lists"))
    assert(nLists.forall(n => n == 1L || n == 2L))
    assert(nLists.contains(2L), "some doc should appear in both top-20 lists")
    // rrf_fixed descending as ordered
    val scores = rows.map(_.getAs[Long]("rrf_fixed")).toSeq
    assert(scores == scores.sortBy(-_))
  }

  // ----------------------------- incremental maintenance (round 11)

  test("appendToIndex touches only the new terms' buckets; queries match a rebuild") {
    import spark.implicits._
    def bucketFiles(root: String): Map[String, Set[String]] = {
      val base = new java.io.File(s"$root/postings")
      base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
            && !f.getName.startsWith("."))
            .map(f => s"${f.getName}:${f.length()}:${f.lastModified()}").toSet)
        .toMap
    }
    val docs = (1L to 200L).map(i =>
      (i, s"alpha bravo tok$i common${i % 7} filler")).toDF("doc_id", "text")
    val extra = Seq((201L, "alpha zulu zulu"), (202L, "yankee")).toDF("doc_id", "text")

    val incRoot = java.nio.file.Files.createTempDirectory("graft-lexinc").toString
    Lexical.buildIndex(docs, "doc_id", "text", incRoot)
    val before = bucketFiles(incRoot)
    val expectedTouched = Seq("alpha", "zulu", "yankee")
      .map(Lexical.bucketOf(_, Lexical.DefaultBuckets)).distinct.size
    val touched = Lexical.appendToIndex(extra, "doc_id", "text", incRoot)
    assert(touched == expectedTouched,
      s"append must report the new terms' shard count: $touched vs $expectedTouched")
    assert(touched < Lexical.DefaultBuckets, "a small append must be sub-linear")
    val after = bucketFiles(incRoot)
    // untouched shard directories are byte-immutable (name+size+mtime)
    val changed = after.keySet.filter(k => before.get(k) != after.get(k)) ++
      (before.keySet -- after.keySet)
    assert(changed.size == touched,
      s"exactly the touched shards may change: $changed (reported $touched)")

    // the appended index answers every scoring query like a full rebuild
    val fullRoot = java.nio.file.Files.createTempDirectory("graft-lexfull").toString
    Lexical.buildIndex(docs.unionByName(extra), "doc_id", "text", fullRoot)
    for (q <- Seq(Seq("alpha", "zulu"), Seq("yankee"), Seq("common3", "filler"))) {
      val inc = Lexical.scoreBM25(spark, incRoot, q, k = 10)
        .collect().map(_.toString).toSeq
      val full = Lexical.scoreBM25(spark, fullRoot, q, k = 10)
        .collect().map(_.toString).toSeq
      assert(inc == full, s"append vs rebuild diverged on $q:\n$inc\nvs\n$full")
      val incV = Lexical.scoreTfIdfNorm(spark, incRoot, q, k = 10)
        .collect().map(_.toString).toSeq
      val fullV = Lexical.scoreTfIdfNorm(spark, fullRoot, q, k = 10)
        .collect().map(_.toString).toSeq
      assert(incV == fullV, s"VSM append vs rebuild diverged on $q")
    }
    // totals advanced by the delta (token + doc counts)
    val tot = spark.read.parquet(s"$incRoot/totals").head
    val fullTot = spark.read.parquet(s"$fullRoot/totals").head
    assert(tot == fullTot, s"totals must match the rebuild: $tot vs $fullTot")
  }

  test("bucket-count drift cannot strand postings: the recorded layout wins") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"alpha tok$i")).toDF("doc_id", "text")
    val extra = Seq((61L, "alpha zulu")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-lexdrift").toString
    // built with a NON-default bucket count; append and score with the
    // DEFAULT argument — the recorded layout must win on both paths, or
    // the appended doc's postings land in shards queries never read
    Lexical.buildIndex(docs, "doc_id", "text", root, buckets = 8)
    assert(Lexical.readMeta(spark, root).contains(8))
    Lexical.appendToIndex(extra, "doc_id", "text", root) // default 64 arg
    val fullRoot = java.nio.file.Files.createTempDirectory("graft-lexdrift2").toString
    Lexical.buildIndex(docs.unionByName(extra), "doc_id", "text", fullRoot, buckets = 8)
    for (q <- Seq(Seq("alpha"), Seq("zulu"))) {
      val inc = Lexical.scoreBM25(spark, root, q, k = 70) // default 64 arg
        .collect().map(_.toString).toSeq
      val full = Lexical.scoreBM25(spark, fullRoot, q, k = 70, buckets = 8)
        .collect().map(_.toString).toSeq
      assert(inc == full, s"drifted-bucket scoring diverged on $q:\n$inc\nvs\n$full")
    }
  }

  test("q375 gate: incrementally appended index matches the corpus-scan form") {
    val idx = SparkEntry.queries("q375_bm25_index_append")(spark, sf())
    val scan = SparkEntry.queries("q358_bm25")(spark, sf())
    assert(idx.collect().map(_.toString).toSeq ==
      scan.collect().map(_.toString).toSeq)
  }
}
