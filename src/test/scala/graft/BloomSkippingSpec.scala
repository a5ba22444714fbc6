package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{BloomSkipping, Skipping}

/** Per-file Bloom-filter skipping: pruning where min/max stats can't
  * (scattered keys), the hash-canonicalization soundness traps (each one
  * a silent-row-loss bug if the probe mis-mirrors Spark's comparison
  * coercion), staleness degradation to stats-only, and incremental
  * maintenance that provably never re-scans covered files.
  */
class BloomSkippingSpec extends SparkTestBase {

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-bloom-$tag").toFile
    d.deleteOnExit()
    d.toString
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** 8 parquet files with `id` round-robin-scattered (every file spans
    * ~the full id domain, so id min/max prune nothing), plus the trap
    * columns: a plain string key, a zero-padded numeric string, a date
    * and a timestamp present in EVERY file.
    */
  private def scatteredLayout(tag: String, withBlooms: Boolean = true): String = {
    val root = tmpDir(tag)
    val df = spark.range(0, 10000).toDF("seq")
      .select(
        (col("seq") * 2).as("id"), // even ids only: odd probes miss everywhere
        concat(lit("t"), col("seq") * 2).as("tag"),
        lpad((col("seq") % 100).cast("string"), 4, "0").as("pad"),
        date_add(lit(java.sql.Date.valueOf("1995-01-01")),
          (col("seq") % 8).cast("int")).as("d"))
      .withColumn("ts", col("d").cast("timestamp"))
    df.repartition(8).write.mode("overwrite").parquet(root)
    Skipping.writeManifest(spark, root, Seq("id", "tag", "pad", "d", "ts"))
    if (withBlooms)
      BloomSkipping.writeBloomIndex(spark, root, Seq("id", "tag", "pad", "d", "ts"))
    root
  }

  private def pruned(root: String, pred: String) =
    Skipping.readPrunedDetailed(spark, root, pred)

  private def assertCorrect(root: String, pred: String): Skipping.Pruned = {
    val pr = pruned(root, pred)
    assert(pr.fallback.isEmpty, s"manifest should engage: ${pr.fallback}")
    assert(sortedRows(pr.df) == sortedRows(spark.read.parquet(root).filter(pred)),
      s"pruned result must equal full scan for: $pred")
    pr
  }

  // ------------------------------------------------------- pruning wins

  test("equality probe on a scattered key prunes where stats keep everything") {
    val root = scatteredLayout("eq")
    val pr = assertCorrect(root, "id = 5000")
    assert(pr.statsSelected == 8,
      s"stats must be useless on a scattered key: kept ${pr.statsSelected}/8")
    assert(pr.selected < pr.statsSelected,
      s"bloom must prune beyond stats: ${pr.selected}/${pr.statsSelected}")
    assert(pr.df.count() == 1)
  }

  test("IN probe prunes to the union of per-key files") {
    val root = scatteredLayout("in")
    val pr = assertCorrect(root, "id IN (100, 5000, 9998)")
    assert(pr.selected < pr.statsSelected)
    assert(pr.df.count() == 3)
  }

  test("absent-but-in-range key prunes to (near) zero files") {
    val root = scatteredLayout("miss")
    // odd id: inside [0, 19998] so stats keep all 8; bloom sees none of it
    val pr = assertCorrect(root, "id = 4999")
    assert(pr.df.count() == 0)
    assert(pr.selected <= 2, // deterministic per dataset; FP budget ~1%/file
      s"a missing key should prune nearly everything: kept ${pr.selected}/8")
  }

  test("OR / AND compose conservatively") {
    val root = scatteredLayout("bool")
    val or = assertCorrect(root, "id = 5000 OR tag = 'no-such-tag'")
    assert(or.df.count() == 1)
    assert(or.selected < or.statsSelected) // both arms bloom-decided
    val and = assertCorrect(root, "id = 5000 AND tag = 't5000'")
    assert(and.df.count() == 1)
    // a range arm is bloom-undecidable but must not break the equality arm
    val mixed = assertCorrect(root, "id = 5000 AND d >= DATE '1990-01-01'")
    assert(mixed.df.count() == 1)
  }

  // ------------------------------------------- canonicalization soundness

  test("string column vs numeric literal NEVER bloom-prunes ('0005' = 5 is true in Spark)") {
    val root = scatteredLayout("strtrap")
    // Spark casts the COLUMN: pad '0005' matches literal 5 — a naive probe
    // would hash "5", miss the bloom (it holds "0005"), and silently drop
    // all matching rows
    val pr = assertCorrect(root, "pad = 5")
    assert(pr.df.count() > 0, "'0005' = 5 rows must survive")
    assert(pr.selected == pr.statsSelected,
      "string-column/non-string-literal must not bloom-prune")
  }

  test("numeric column vs padded string literal probes through the column type") {
    val root = scatteredLayout("numcoerce")
    // Spark casts '0042' to 42; the probe must hash canonical "42"
    val pr = assertCorrect(root, "id = '0042'")
    assert(pr.df.count() == 1)
    assert(pr.selected < pr.statsSelected, "canonicalized probe should prune")
  }

  test("non-canonical date and timestamp literals canonicalize before hashing") {
    val root = scatteredLayout("datelit")
    // every file holds every date: a mis-canonicalized probe ('1995-1-3'
    // hashed raw) would prune ALL files and lose every row
    val d = assertCorrect(root, "d = '1995-1-3'")
    assert(d.df.count() > 0, "sloppy date literal must not lose rows")
    val ts = assertCorrect(root, "ts = '1995-01-03 00:00:00'")
    assert(ts.df.count() > 0, "timestamp literal must not lose rows")
  }

  test("timestamp probes NEVER prune across a session-timezone drift") {
    // the engine interprets a string literal under the CURRENT session tz
    // while the bloom holds strings rendered under the BUILD tz — under a
    // drifted zone the two name different instants, so a confident miss
    // would silently drop matching rows. The guard answers may-match.
    val root = scatteredLayout("tzdrift") // built under the session default (UTC)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      // rows matching under LA tz exist (instant 1995-01-03T08:00Z renders
      // as 1995-01-03 00:00:00 LA); the UTC-built bloom has no such string
      val pr = pruned(root, "ts = '1995-01-02 16:00:00'")
      assert(pr.fallback.isEmpty, s"manifest should engage: ${pr.fallback}")
      assert(sortedRows(pr.df) ==
        sortedRows(spark.read.parquet(root).filter("ts = '1995-01-02 16:00:00'")),
        "tz-drifted timestamp probe must not lose rows")
      assert(pr.df.count() > 0, "the drifted probe matches real rows")
      // date probes stay prunable across the drift (dates are tz-free)
      val d = assertCorrect(root, "d = '1995-01-03'")
      assert(d.df.count() > 0)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("null literals never probe; null-safe equality keeps files") {
    val root = scatteredLayout("nulls")
    val eq = assertCorrect(root, "id = NULL") // matches nothing, stats rule
    assert(eq.df.count() == 0)
    // 't10001' sits INSIDE the files' [t0, t9998] lexical range (so stats
    // keep everything) but names an odd id that exists nowhere
    val nsafe = assertCorrect(root, "tag <=> 't10001'")
    assert(nsafe.df.count() == 0)
    assert(nsafe.selected < nsafe.statsSelected) // non-null <=> probes fine
  }

  // ------------------------------------------------ staleness / lifecycle

  test("stale bloom index degrades to stats-only pruning, loudly, never wrongly") {
    import spark.implicits._
    val root = scatteredLayout("stale")
    // append a file behind the bloom index's back, refresh ONLY the stats
    // manifest — the reader must distrust the bloom index but keep going
    Seq((20002L, "t20002", "0001", java.sql.Date.valueOf("1995-01-01")))
      .toDF("id", "tag", "pad", "d")
      .withColumn("ts", col("d").cast("timestamp"))
      .coalesce(1).write.mode("append").parquet(root)
    Skipping.updateManifest(spark, root, Seq("id", "tag", "pad", "d", "ts"))
    val pr = assertCorrect(root, "id = 20002")
    assert(pr.statsSelected == -1, "stale bloom index must be ignored")
    assert(pr.df.count() == 1, "the appended row must be found")
  }

  test("incremental update scans ONLY uncovered files, then pruning re-engages") {
    import spark.implicits._
    val root = scatteredLayout("incr")
    // the appended id is odd — absent from every original file — but
    // INSIDE their [0, 19998] range, so the stats stage keeps all 9 files
    // and only the refreshed bloom can single out the new one
    Seq((10001L, "t10001x", "0002", java.sql.Date.valueOf("1995-01-02")))
      .toDF("id", "tag", "pad", "d")
      .withColumn("ts", col("d").cast("timestamp"))
      .coalesce(1).write.mode("append").parquet(root)
    Skipping.updateManifest(spark, root, Seq("id", "tag", "pad", "d", "ts"))
    val scanned = BloomSkipping.updateBloomIndex(
      spark, root, Seq("id", "tag", "pad", "d", "ts"))
    assert(scanned == 1, s"only the appended file may be scanned, got $scanned")
    val pr = assertCorrect(root, "id = 10001")
    assert(pr.statsSelected == 9, "refreshed index must be trusted again")
    assert(pr.selected < pr.statsSelected)
    assert(pr.df.count() == 1)
    // old keys still probe correctly through the carried-forward entries
    val old = assertCorrect(root, "id = 5000")
    assert(old.df.count() == 1 && old.selected < old.statsSelected)
  }

  test("a column-set change falls back to a full rebuild") {
    val root = scatteredLayout("colchange")
    val scanned = BloomSkipping.updateBloomIndex(spark, root, Seq("id"))
    assert(scanned == 8, "different column set must rebuild every file")
    val pr = assertCorrect(root, "id = 5000")
    assert(pr.selected < pr.statsSelected)
  }

  test("writer append paths keep an opted-in bloom index fresh") {
    import spark.implicits._
    val root = scatteredLayout("writer")
    // replaceWhere's no-existing-table sibling is exercised elsewhere; here
    // the general path rewrites data + stats and must refresh blooms too
    graft.etl.Writer.replaceWhere(
      spark,
      Seq((30000L, "t30000", "0003", java.sql.Date.valueOf("1995-01-03")))
        .toDF("id", "tag", "pad", "d")
        .withColumn("ts", col("d").cast("timestamp")),
      root, Nil, col("id") === 30000L,
      statsColumns = Seq("id", "tag", "pad", "d", "ts"))
    val pr = assertCorrect(root, "id = 30000")
    assert(pr.statsSelected >= 0, "bloom index must be fresh after the write")
    assert(pr.df.count() == 1)
  }

  // ------------------------------------------------------------- q361 gate

  test("q361 engages bloom pruning at sf0.001 and matches the plain filter") {
    val df = SparkEntry.queries("q361_skipping_bloom")(spark, sf())
    assert(df.count() > 0)
  }

  // ------------------------------ double-space coercion collapse (round 11)

  test("double-space coercion collapse never loses rows (stats AND blooms)") {
    import spark.implicits._
    val root = tmpDir("lossy")
    val big = 1L << 53 // 9007199254740992: smallest long with a collapse twin
    // round-robin into 4 files: each value's min==max IS the value, so an
    // exact-order evaluator confidently (and wrongly) prunes its twin's file
    Seq((big, 0.5), (big + 1, 1.5), (100L, 9007199254740992.0), (200L, 2.5))
      .toDF("big", "dcol")
      .repartition(4).write.mode("overwrite").parquet(root)
    Skipping.writeManifest(spark, root, Seq("big", "dcol"))
    BloomSkipping.writeBloomIndex(spark, root, Seq("big", "dcol"))
    // fractional literal vs bigint column: Spark coerces BOTH sides to
    // double, so 2^53 and 2^53+1 BOTH match — neither file may prune
    val eq = assertCorrect(root, "big = 9007199254740993.0D")
    assert(eq.df.count() == 2, "both 2^53-collapsed longs must survive '='")
    // a STRING literal casts to the COLUMN type (measured, ANSI on and
    // off) — exact semantics, so the twin does NOT match and the probe
    // may (and should) still prune its file
    val s = assertCorrect(root, "big = '9007199254740992'")
    assert(s.df.count() == 1, "string literal is cast to bigint: exact match only")
    assert(s.selected == 1, "canonicalized string probe must still prune")
    // non-strict range with a fractional literal: (double)(2^53+1) <= 2^53
    val le = assertCorrect(root, "big <= 9007199254740992.0D")
    assert(le.df.count() == 4, "<= must keep the row exact order calls greater")
    // bigint literal vs DOUBLE column: the literal rounds onto the stored double
    val dc = assertCorrect(root, "dcol = 9007199254740993")
    assert(dc.df.count() == 1, "double column must match the rounding literal")
    // soundness costs no pruning where double space is exact
    val keep = assertCorrect(root, "big = 100")
    assert(keep.df.count() == 1)
    assert(keep.selected == 1, "in-range equality must still prune to one file")
  }

  // ----------------------------------- index sizing + contract (round 11)

  test("incremental refresh reuses the recorded bitsPerItem, not a default") {
    import spark.implicits._
    val root = tmpDir("bits")
    spark.range(0, 1000).toDF("id")
      .repartition(2).write.mode("overwrite").parquet(root)
    BloomSkipping.writeBloomIndex(spark, root, Seq("id"), bitsPerItem = 20)
    val fs = new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(BloomSkipping.readIndex(fs, new HPath(root)).get.bitsPerItem == 20)
    // append, then refresh through the maintenance entry point with the
    // DEFAULT argument — the recorded sizing must survive the round trip
    spark.range(1000, 1500).toDF("id")
      .repartition(1).write.mode("append").parquet(root)
    BloomSkipping.updateBloomIndex(spark, root, Seq("id"))
    assert(BloomSkipping.readIndex(fs, new HPath(root)).get.bitsPerItem == 20,
      "refresh must carry the build-time sizing forward")
  }

  test("empty bloomColumns is a loud contract error, not a NoSuchElement") {
    val root = tmpDir("nocols")
    spark.range(0, 10).toDF("id").write.mode("overwrite").parquet(root)
    val e = intercept[IllegalArgumentException] {
      BloomSkipping.writeBloomIndex(spark, root, Seq.empty)
    }
    assert(e.getMessage.contains("non-empty"))
    val e2 = intercept[IllegalArgumentException] {
      BloomSkipping.updateBloomIndex(spark, root, Seq.empty)
    }
    assert(e2.getMessage.contains("non-empty"))
  }
}
