package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Small-file compaction (the OPTIMIZE bin-packing half of Delta/Iceberg
  * maintenance): coalesce a table's under-sized parquet files into
  * ~`targetBytes` files WITHOUT rewriting the well-sized ones. Small
  * files are the classic slow killer of a long-lived 100 TB table — a
  * streaming or per-batch append writes MB-sized files, and a year later
  * every scan pays 100k file-open round trips and the driver's file
  * index dwarfs the query. Compaction cost is ∝ the small files' bytes,
  * never the table (the same cost-follows-the-slice rule as
  * [[Writer.overwritePartitions]] and [[Skipping.updateManifest]]).
  *
  * Mechanics per partition directory (bins NEVER cross a partition dir —
  * partition values are directory-derived, so merging across dirs would
  * rewrite rows under the wrong key):
  *
  *  1. files smaller than `targetBytes` are first-fit-decreasing packed
  *     into bins of ≤ `targetBytes` total; only bins of ≥2 files compact
  *     (a lone small file gains nothing from a rewrite);
  *  2. each bin is read (raw files — the physical schema rides along
  *     unchanged) and written as ONE file into a hidden staging dir;
  *  3. commit order is duplicate-safe AND crash-recoverable: a commit
  *     JOURNAL (dest + source list, hidden dir) is written first, then
  *     the compacted file becomes visible, then the originals are
  *     deleted, then the journal. A reader listing mid-commit can see a
  *     row twice, never lose one; a crash leaves either a hidden staging
  *     dir (invisible to readers, swept by the next run) or a journaled
  *     half-commit the next run COMPLETES (dest visible ⇒ finish the
  *     source deletes; dest absent ⇒ drop the journal, originals are
  *     intact) — without the journal, a crash between rename and deletes
  *     would leave both copies live and the duplicate rows would be
  *     baked in forever by the next pack. Single-writer, same stance as
  *     [[Writer.replaceWhere]]'s documented swap window; tables needing
  *     atomic maintenance use the versioned protocol
  *     ([[Writer.replaceWhereVersioned]]) where a compacted version
  *     commits under the claim protocol before the pointer flip.
  *  4. the skipping manifest and Bloom index, if present, are refreshed
  *     INCREMENTALLY (only compacted output is harvested/scanned;
  *     deleted originals drop out) — compaction leaves pruning engaged.
  *
  * One Spark job per bin, submitted sequentially from the driver: bins
  * are independent, so a deployment compacting thousands of partitions
  * runs this per-partition from its scheduler; the in-process loop is
  * the local building block.
  */
object Compaction {

  final case class Report(filesBefore: Int, filesAfter: Int,
                          binsCompacted: Int, bytesRewritten: Long)

  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L * 1024 * 1024): Report = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qualifiedRoot = fs.makeQualified(rootPath).toString

    // recover any interrupted COMMIT before anything else — including the
    // `before` listing, which must not see files recovery deletes: if a
    // crash landed between the rename (compacted file visible) and the
    // source deletes, both copies of those rows are live — finish the
    // deletes now, or the next pack would bake the duplicates in
    // permanently. A journal whose dest never appeared is a pre-rename
    // crash: the originals are intact, so the journal is simply dropped
    // (the orphaned staging output is swept below).
    val commits = new HPath(rootPath, ".graft-compact-commits")
    if (fs.exists(commits)) {
      for (st <- fs.listStatus(commits) if st.isFile) {
        val lines = readText(fs, st.getPath).split("\n").filter(_.nonEmpty)
        if (lines.nonEmpty && fs.exists(new HPath(rootPath, lines.head)))
          lines.tail.foreach(rel => fs.delete(new HPath(rootPath, rel), false))
        fs.delete(st.getPath, false)
        ()
      }
    }

    val before = Skipping.listDataFiles(fs, rootPath)

    // sweep any staging leftovers from a crashed run (hidden, so readers
    // never saw them; their bins' originals are still live and intact)
    val staging = new HPath(rootPath, ".graft-compact-staging")
    fs.delete(staging, true)

    val byDir = before.groupBy { case (rel, _) =>
      val i = rel.lastIndexOf('/')
      if (i < 0) "" else rel.substring(0, i)
    }
    var bins = List.empty[(String, Seq[(String, Long)])] // (dir, files)
    for ((dir, files) <- byDir.toSeq.sortBy(_._1)) {
      val small = files.filter(_._2 < targetBytes).sortBy(-_._2)
      // first-fit decreasing into ≤ targetBytes bins
      val open = scala.collection.mutable.ArrayBuffer.empty[(Long, List[(String, Long)])]
      for (f <- small) {
        val i = open.indexWhere(_._1 + f._2 <= targetBytes)
        if (i >= 0) open(i) = (open(i)._1 + f._2, f :: open(i)._2)
        else open += ((f._2, List(f)))
      }
      bins :::= open.toList.collect { case (_, fl) if fl.size >= 2 => (dir, fl) }
    }
    if (bins.isEmpty)
      return Report(before.size, before.size, 0, 0L)

    var rewritten = 0L
    var binIdx = 0
    for ((dir, files) <- bins) {
      val binStage = new HPath(staging, s"bin-$binIdx")
      binIdx += 1
      // mergeSchema: files in a bin can carry evolved schemas (a column
      // added after some were written); without the union schema the
      // sampled file's schema wins and absent columns are silently
      // DROPPED from the compacted output — permanent loss once the
      // originals are deleted below
      spark.read.option("mergeSchema", "true")
        .parquet(files.map { case (rel, _) => s"$qualifiedRoot/$rel" }: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(binStage.toString)
      val produced = fs.listStatus(binStage)
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
          && !st.getPath.getName.startsWith("."))
      require(produced.length == 1,
        s"coalesce(1) must produce one file, got ${produced.length}")
      val destDir = if (dir.isEmpty) rootPath else new HPath(rootPath, dir)
      val destName =
        s"part-gcompact-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
      val dest = new HPath(destDir, destName)
      val destRel = if (dir.isEmpty) destName else s"$dir/$destName"
      // journal BEFORE the rename: dest first line, sources after — the
      // recovery sweep above replays exactly this intent after a crash
      val journal = new HPath(commits, s"commit-$binIdx.txt")
      writeText(fs, journal,
        (destRel +: files.map(_._1)).mkString("", "\n", "\n"))
      // visible-first, delete-after: duplicates possible mid-commit, loss never
      if (!fs.rename(produced(0).getPath, dest))
        throw new java.io.IOException(s"could not commit compacted file at $dest")
      files.foreach { case (rel, _) => fs.delete(new HPath(rootPath, rel), false) }
      fs.delete(journal, false)
      rewritten += files.map(_._2).sum
    }
    fs.delete(staging, true)
    fs.delete(commits, true)

    // keep pruning engaged: refresh whichever side-indexes the root carries,
    // incrementally (only the compacted outputs are harvested / scanned)
    Skipping.readManifest(fs, rootPath).foreach { m =>
      Skipping.updateManifest(spark, root, m.statsColumns)
      ()
    }
    BloomSkipping.readIndex(fs, rootPath).foreach { idx =>
      BloomSkipping.updateBloomIndex(spark, root, Some(idx),
        idx.colTypes.keys.toSeq.sorted, bitsPerItem = idx.bitsPerItem)
      ()
    }
    val after = Skipping.listDataFiles(fs, rootPath)
    Report(before.size, after.size, bins.size, rewritten)
  }

  private def readText(fs: FileSystem, p: HPath): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toString("UTF-8")
    } finally in.close()
  }

  private def writeText(fs: FileSystem, p: HPath, txt: String): Unit = {
    val out = fs.create(p, true)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }
}
