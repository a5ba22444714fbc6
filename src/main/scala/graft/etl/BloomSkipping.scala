package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal, XxHash64}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-file BLOOM FILTERS for equality-predicate data skipping — the
  * pruning lever min/max statistics cannot supply. On a layout where a
  * high-cardinality key is scattered across files (any layout not sorted
  * by that key — i.e. every secondary key of every real table), each
  * file's [min, max] spans essentially the whole key domain and
  * [[Skipping.readPruned]] keeps every file; a per-file Bloom filter
  * answers "is THIS key possibly in THIS file" and prunes an equality /
  * IN probe to the handful of files that actually contain the key. This
  * is Delta's Bloom-filter index / parquet's column bloom idea in the
  * same side-manifest form as [[Skipping]]'s stats manifest, and it
  * composes with it: stats prune ranges, blooms prune point lookups,
  * [[Skipping.readPrunedDetailed]] applies both.
  *
  * Same design rules as [[Skipping]]:
  *
  *  1. '''Never load-bearing for correctness.''' The reader re-applies the
  *     full predicate after the scan; a Bloom "definitely absent" answer
  *     is the only prune, and Bloom filters have no false negatives —
  *     provided probe-side hashing EXACTLY mirrors build-side hashing.
  *     Everything uncertain (missing column, uncastable literal, type the
  *     canonicalization can't pin) answers "may match".
  *  2. '''Self-validating.''' The index records every data file's
  *     (relative path, size) at build time; the reader requires set
  *     equality with the live listing before trusting a single filter,
  *     and otherwise IGNORES the index with a loud warning — stats
  *     pruning still applies, so staleness degrades performance only.
  *  3. '''Incremental maintenance.''' [[updateBloomIndex]] builds filters
  *     only for files the index does not cover and carries live entries
  *     forward — the append path never re-scans old data (same contract
  *     as [[Skipping.updateManifest]], proven the same way in spec).
  *
  * Unlike the stats manifest, building a Bloom filter requires reading
  * the COLUMN DATA (footers don't carry blooms unless the writer enabled
  * parquet's, which Spark leaves off by default) — one column-pruned
  * distributed scan per build, grouped by `input_file_name`. That cost is
  * explicit and amortized: build once at sink time, prune every read.
  *
  * '''Hash canonicalization contract''' (the correctness core): build
  * side inserts `xxhash64(cast(col AS STRING))`; probe side evaluates the
  * SAME two Catalyst ops driver-side — literal → column's recorded type
  * (TRY mode: uncastable ⇒ keep) → STRING → XxHash64. Casting the
  * literal THROUGH the column type first mirrors Spark's comparison
  * coercion for every numeric/date/decimal column (`intCol = '05'`
  * matches rows with value 5; the probe hashes "5", not "05"). TWO
  * directions cannot be mirrored, and both answer "may match" instead
  * of ever pruning: (a) a STRING column compared to a non-string
  * literal — Spark casts the COLUMN, and "05" = 5 is true while the
  * bloom only holds "05" (the same rule [[Skipping]]'s stats evaluator
  * applies to its string arm); (b) an INTEGRAL or DECIMAL column
  * compared to a FRACTIONAL (float/double) literal — Spark coerces
  * BOTH sides to DOUBLE, which is lossy on the column side (distinct
  * longs past 2^53, or high-scale decimals, collapse onto one double),
  * so several distinct column values satisfy the predicate while the
  * probe could only hash the single `try_cast(lit AS colType)` value.
  * (String literals are safe: measured on Spark 4 with ANSI both off
  * and on, a string literal casts to the COLUMN's type — exactly the
  * canonicalization pipeline — not double-promoted.)
  * Timestamp canonicalization is session-timezone-dependent; the index
  * records the build session's zone and the probe casts with it, and
  * [[updateBloomIndex]] refuses to extend across a zone change when a
  * timestamp column is indexed (full rebuild instead).
  */
object BloomSkipping {

  val IndexName = "_graft_bloom.json"
  val FormatVersion = 1

  /** One file's filters: base64(spark BloomFilter serialized) per column.
    * Absent column = no filter harvested (probe answers "may match").
    */
  final case class FileBlooms(path: String, size: Long, b64: Map[String, String])
  final case class BloomIndex(formatVersion: Int, stamp: String, tz: String,
                              colTypes: Map[String, String], // lowercase name -> DDL
                              files: List[FileBlooms],
                              // build-time sizing, recorded so incremental
                              // refresh keeps the owner's FPP target instead
                              // of silently resizing new files' filters
                              bitsPerItem: Int = 10)

  /** ~10 bits/item ≈ 1% FPP, floored at 64 Kbit and capped at 8 Mbit
    * (1 MB serialized) per column per file — past the cap the filter
    * saturates gradually (prunes less, never wrongly). The cap also keeps
    * the JSON index driver-manageable: at 100k files × 1 col it bounds the
    * index at ~130 GB worst-case, so REAL 100 TB deployments size
    * `bitsPerItem` down or index fewer columns; the default targets the
    * 10^2–10^4-file tables where a JSON side-index is the right weight.
    */
  private val MinBits = 1L << 16
  private val MaxBits = 1L << 23

  private def sizeBits(maxRowsPerFile: Long, bitsPerItem: Int): Long =
    math.min(math.max(maxRowsPerFile * bitsPerItem, MinBits), MaxBits)

  // ---------------------------------------------------------------- build

  /** Build Bloom filters for `bloomColumns` over every data file under
    * `root` and write the index. Two distributed jobs: a near-free
    * per-file row count (sizes the filters), then the column-pruned
    * hash+aggregate scan. Returns the number of files indexed.
    *
    * Concurrent writers: last-write-wins on the rename, safe for the same
    * reason as [[Skipping.writeManifest]] — the index is self-validating
    * against the live (path, size) listing, so a losing writer's index
    * either matches the final file state or is ignored loudly.
    */
  def writeBloomIndex(spark: SparkSession, root: String,
                      bloomColumns: Seq[String], bitsPerItem: Int = 10): Int = {
    require(bloomColumns.nonEmpty,
      s"writeBloomIndex($root): bloomColumns must be non-empty — an index " +
        "over zero columns can never prune anything")
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Skipping.listDataFiles(fs, rootPath)
    val entries =
      if (files.isEmpty) Seq.empty
      else harvestBlooms(spark, fs, rootPath, files, bloomColumns, bitsPerItem)
    commitIndex(spark, fs, rootPath, bloomColumns, files, entries, bitsPerItem)
    files.size
  }

  /** Incremental refresh after an append / partial overwrite: keep every
    * entry whose (path, size) is still live, build filters ONLY for
    * uncovered files, drop the rest. Falls back to a full
    * [[writeBloomIndex]] when the index is absent, format-drifted, was
    * built for a different column set, or (timestamp columns only) under
    * a different session timezone. Returns the number of files whose
    * data was actually scanned — the spec's no-re-read proof.
    */
  def updateBloomIndex(spark: SparkSession, root: String,
                       bloomColumns: Seq[String], bitsPerItem: Int = 10): Int = {
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    updateBloomIndex(spark, root, readIndex(fs, rootPath), bloomColumns, bitsPerItem)
  }

  /** Pre-parsed-prior overload: callers that already read the index to
    * decide WHETHER to refresh (Writer's maintenance hook, Compaction)
    * pass it through instead of paying a second full read + parse of the
    * blob-heavy JSON on the driver.
    */
  def updateBloomIndex(spark: SparkSession, root: String,
                       prior: Option[BloomIndex],
                       bloomColumns: Seq[String], bitsPerItem: Int): Int = {
    require(bloomColumns.nonEmpty,
      s"updateBloomIndex($root): bloomColumns must be non-empty — an index " +
        "over zero columns can never prune anything")
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wanted = bloomColumns.map(_.toLowerCase).sorted.toList
    prior match {
      case Some(idx) if idx.formatVersion == FormatVersion &&
          idx.colTypes.keySet == wanted.toSet &&
          (idx.tz == sessionTz(spark) ||
            !idx.colTypes.valuesIterator.exists(tzSensitive)) =>
        val actual = Skipping.listDataFiles(fs, rootPath)
        val actualSet = actual.toSet
        val kept = idx.files.filter(f => actualSet((f.path, f.size)))
        val known = kept.map(f => (f.path, f.size)).toSet
        val fresh = actual.filterNot(known)
        // extend with the index's RECORDED sizing, not the caller's: a
        // maintenance hook that hardcoded a default would otherwise
        // silently drift the FPP of new files away from the build target.
        // Resizing an index is a full writeBloomIndex rebuild by design.
        val freshEntries =
          if (fresh.isEmpty) Seq.empty
          else harvestBlooms(spark, fs, rootPath, fresh, bloomColumns,
            idx.bitsPerItem)
        commitIndex(spark, fs, rootPath, bloomColumns, actual,
          kept ++ freshEntries, idx.bitsPerItem)
        fresh.size
      case _ =>
        // writeBloomIndex already returns the count of exactly the files
        // it indexed; re-listing here could race a concurrent append and
        // misreport the files-scanned figure the spec treats as proof
        writeBloomIndex(spark, root, bloomColumns, bitsPerItem)
    }
  }

  private def sessionTz(spark: SparkSession): String =
    spark.sessionState.conf.sessionLocalTimeZone

  private def tzSensitive(ddl: String): Boolean =
    try CatalystSqlParser.parseDataType(ddl)
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]
    catch { case _: Exception => true } // unparseable type: assume sensitive

  /** The column-pruned bloom-building scan over `files` only. Groups by
    * `input_file_name`, so each task aggregates the handful of files it
    * actually reads; the shuffle carries one (numBits/8)-byte blob per
    * (file × column). Filters are sized uniformly at the LARGEST file's
    * row count (the aggregate's sizing arguments are literals) — smaller
    * files just get a lower false-positive rate.
    */
  private def harvestBlooms(spark: SparkSession, fs: FileSystem, rootPath: HPath,
                            files: Seq[(String, Long)], bloomColumns: Seq[String],
                            bitsPerItem: Int): Seq[FileBlooms] = {
    graft.functions.GraftFunctions.register(spark)
    val qualifiedRoot = fs.makeQualified(rootPath).toString
    val sizeByPath = files.toMap
    val paths = files.map { case (rel, _) => s"$qualifiedRoot/$rel" }
    val df = spark.read.option("basePath", qualifiedRoot).parquet(paths: _*)
    val schema = df.schema
    val resolved = bloomColumns.map { c =>
      schema.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"bloom column '$c' not found in schema ${schema.fieldNames.mkString(",")}"))
    }
    // job 1: per-file row counts (empty projection — parquet serves this
    // from metadata-cheap reads) to size the filters
    val maxRowsRow = df.groupBy(input_file_name()).count()
      .agg(max(col("count"))).collect()(0)
    val maxRows = if (maxRowsRow.isNullAt(0)) 0L else maxRowsRow.getLong(0)
    // heap-derived total-index budget (1/8 of max heap, overridable): the
    // blobs are collected to the driver and live in the JSON index, so at
    // 100k files the per-blob size must shrink (higher FPP — prunes less,
    // never wrongly) rather than OOM the driver. Same discipline as
    // graft.util.HeapBounds: a fixed per-file constant is a scale cliff.
    val budgetBytes = sys.props.get("graft.bloom.maxIndexBytes").map(_.toLong)
      .getOrElse(Runtime.getRuntime.maxMemory() / 8)
    val perBlobBits = budgetBytes / math.max(1L, files.size.toLong * resolved.size) * 8L
    val bits = math.max(1L << 13,
      math.min(sizeBits(math.max(maxRows, 1L), bitsPerItem), perBlobBits))
    val items = math.max(math.min(maxRows, 4000000L), 1L)
    // job 2: one bloom per (file, column)
    val aggs = resolved.map { f =>
      call_function("graft_bloom_agg",
        xxhash64(col(f.name).cast("string")), lit(items), lit(bits))
        .as(s"__bf_${f.name.toLowerCase}")
    }
    val rows = df.groupBy(input_file_name().as("__file")).agg(aggs.head, aggs.tail: _*)
      .collect()
    val rootUri = fs.makeQualified(rootPath).toUri
    val enc = java.util.Base64.getEncoder
    rows.toSeq.map { r =>
      val raw = r.getAs[String]("__file")
      // input_file_name() is the percent-ENCODED URI form; the listing's
      // keys (listDataFiles) are DECODED paths. Decode on every arm —
      // an encoded-vs-decoded mismatch records size=-1, which fails the
      // live-listing validation forever and silently disables the index.
      val rel =
        try rootUri.relativize(new java.net.URI(raw)).getPath
        catch {
          case _: Exception =>
            val stripped = raw.stripPrefix(qualifiedRoot).stripPrefix("/")
            try new java.net.URI(stripped).getPath
            catch { case _: Exception => stripped }
        }
      val size = sizeByPath.getOrElse(rel, -1L)
      if (size < 0)
        System.err.println(s"[bloom-skipping] WARN: harvested file '$raw' " +
          s"(rel '$rel') not found in the listing keys — this entry will " +
          "fail the live-listing validation and the index will degrade to " +
          "stats-only until rebuilt")
      val cols = resolved.flatMap { f =>
        Option(r.getAs[Array[Byte]](s"__bf_${f.name.toLowerCase}"))
          .map(b => f.name.toLowerCase -> enc.encodeToString(b))
      }.toMap
      FileBlooms(rel, size, cols)
    }
  }

  private def commitIndex(spark: SparkSession, fs: FileSystem, rootPath: HPath,
                          bloomColumns: Seq[String], allFiles: Seq[(String, Long)],
                          entries: Seq[FileBlooms], bitsPerItem: Int): Unit = {
    // record the GLOBAL column types (probe-side canonicalization input);
    // resolved against the root's schema so partition columns type
    // consistently with what a reader of this root sees
    val colTypes: Map[String, String] =
      if (allFiles.isEmpty) bloomColumns.map(_.toLowerCase -> "string").toMap
      else {
        val schema = spark.read.parquet(fs.makeQualified(rootPath).toString).schema
        bloomColumns.map { c =>
          val f = schema.find(_.name.equalsIgnoreCase(c)).getOrElse(
            throw new IllegalArgumentException(s"bloom column '$c' not in schema"))
          c.toLowerCase -> f.dataType.sql
        }.toMap
      }
    // entries for files the harvest never saw (all-rows-null or empty
    // files produce no group) are recorded WITHOUT filters — the (path,
    // size) must still be in the snapshot or the index reads as stale
    val covered = entries.map(f => (f.path, f.size)).toSet
    val padding = allFiles.filterNot(covered)
      .map { case (p, s) => FileBlooms(p, s, Map.empty) }
    val all = (entries ++ padding).sortBy(_.path)
    val json = {
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods
      val filesJ = org.json4s.JArray(all.map { f =>
        val j = ("path" -> f.path) ~ ("size" -> f.size) ~
          ("cols" -> org.json4s.JObject(
            f.b64.toList.sortBy(_._1).map { case (n, b) => n -> org.json4s.JString(b) }))
        j: org.json4s.JValue
      }.toList)
      val j = ("formatVersion" -> FormatVersion) ~
        ("stamp" -> s"graft-${System.currentTimeMillis()}") ~
        ("tz" -> sessionTz(spark)) ~
        ("bitsPerItem" -> bitsPerItem) ~
        ("colTypes" -> org.json4s.JObject(
          colTypes.toList.sortBy(_._1).map { case (n, t) => n -> org.json4s.JString(t) })) ~
        ("files" -> filesJ)
      JsonMethods.compact(JsonMethods.render(j))
    }
    val tmp = new HPath(rootPath, s".${IndexName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8"))
    finally out.close()
    val dest = new HPath(rootPath, IndexName)
    fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"could not move bloom index into place at $dest")
    ()
  }

  // ----------------------------------------------------------------- read

  def readIndex(fs: FileSystem, root: HPath): Option[BloomIndex] = {
    val p = new HPath(root, IndexName)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
      Some(parseIndex(txt))
    }
  }

  /** Validate `idx` against the live listing; Some(per-file probe map)
    * when trustworthy, None (with a stderr warning) otherwise.
    */
  private[graft] def validated(idx: BloomIndex, actual: Seq[(String, Long)],
                             root: String): Option[Map[String, FileBlooms]] = {
    if (idx.formatVersion != FormatVersion) {
      System.err.println(s"[graft.BloomSkipping] WARNING: ignoring bloom index at " +
        s"$root — format v${idx.formatVersion} != expected v$FormatVersion")
      None
    } else if (idx.files.map(f => (f.path, f.size)).toSet != actual.toSet) {
      System.err.println(s"[graft.BloomSkipping] WARNING: ignoring STALE bloom index " +
        s"at $root (stamp ${idx.stamp}) — file set drifted; stats-only pruning applies")
      None
    } else Some(idx.files.map(f => f.path -> f).toMap)
  }

  // --------------------------------------------------------- skip decision

  /** Per-[[BloomIndex]] probe context: caches parsed column types and
    * deserialized filters across the files of one pruning pass (the
    * filters dominate — decode each at most once per query, not per file).
    */
  final class Prober(idx: BloomIndex, sessionTz: String) {
    private val types: Map[String, Option[DataType]] =
      idx.colTypes.map { case (n, ddl) =>
        n -> (try Some(CatalystSqlParser.parseDataType(ddl))
        catch { case _: Exception => None })
      }
    private val filters =
      scala.collection.mutable.HashMap.empty[(String, String),
        Option[org.apache.spark.util.sketch.BloomFilter]]

    private def filterFor(f: FileBlooms, col: String) =
      filters.getOrElseUpdate((f.path, col),
        f.b64.get(col).flatMap { b64 =>
          try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(
            java.util.Base64.getDecoder.decode(b64)))
          catch { case _: Exception => None }
        })

    /** "May a row of `f` satisfy `colName = lit`?" — false ONLY on a
      * confident Bloom miss. Mirrors the build-side hash exactly; every
      * uncertainty (unknown column, string column vs non-string literal,
      * uncastable literal, undecodable filter) answers true.
      */
    def mayEqual(f: FileBlooms, colName: String, lit: Literal): Boolean = {
      if (lit.value == null) return true
      val colType = types.getOrElse(colName, None).getOrElse(return true)
      // Spark compares a STRING column to a non-string literal by casting
      // the COLUMN ('05' = 5 is true); the bloom holds raw column strings,
      // so only string-literal probes are sound on string columns
      if (colType.isInstanceOf[StringType] && !lit.dataType.isInstanceOf[StringType])
        return true
      // an integral/decimal column vs a FRACTIONAL literal coerces BOTH
      // sides to DOUBLE — lossy on the column side, so distinct column
      // values (longs past 2^53; high-scale decimals) can collapse onto
      // the literal's double while the probe hashes only the single
      // try_cast(lit AS colType) value. A confident miss here would
      // silently drop matching rows; never prune this shape.
      import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType}
      val litFractional = lit.dataType == FloatType || lit.dataType == DoubleType
      val colLossyUnderDouble = colType == ByteType || colType == ShortType ||
        colType == IntegerType || colType == LongType ||
        colType.isInstanceOf[DecimalType]
      if (litFractional && colLossyUnderDouble)
        return true
      // (string literals are SAFE here: measured on Spark 4 with ANSI
      // both off and on, a string literal is cast to the COLUMN's type —
      // exactly the canonicalHash pipeline below — not double-promoted)
      // timestamp probes are only sound in the BUILD session's timezone:
      // the engine interprets a string literal under the CURRENT session
      // tz while the bloom holds strings rendered under idx.tz — under a
      // drifted zone the two name different instants and a confident miss
      // would silently drop matching rows. Never prune across the drift
      // (updateBloomIndex refuses to EXTEND across it for the same reason).
      if (colType.isInstanceOf[org.apache.spark.sql.types.TimestampType] &&
        sessionTz != idx.tz)
        return true
      val bf = filterFor(f, colName).getOrElse(return true)
      canonicalHash(lit, colType) match {
        case Some(h) => bf.mightContainLong(h)
        case None => true
      }
    }

    /** literal → column type (TRY: uncastable ⇒ None) → STRING → XxHash64,
      * the exact build-side pipeline evaluated driver-side.
      */
    private def canonicalHash(lit: Literal, colType: DataType): Option[Long] =
      try {
        if (!Cast.canCast(lit.dataType, colType)) return None
        val asCol = Cast(lit, colType, Some(idx.tz), EvalMode.TRY).eval(null)
        if (asCol == null) return None
        val canonical =
          Cast(Literal(asCol, colType), StringType, Some(idx.tz), EvalMode.TRY).eval(null)
        if (canonical == null) return None
        Some(new XxHash64(Seq(Literal(canonical, StringType))).eval(null)
          .asInstanceOf[Long])
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ------------------------------------------------------------------ json

  private def parseIndex(txt: String): BloomIndex = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val formats: Formats = DefaultFormats
    val j = JsonMethods.parse(txt)
    BloomIndex(
      (j \ "formatVersion").extract[Int],
      (j \ "stamp").extract[String],
      (j \ "tz").extract[String],
      (j \ "colTypes") match {
        case JObject(fields) => fields.map { case (n, v) => n -> v.extract[String] }.toMap
        case _ => Map.empty
      },
      (j \ "files").extract[List[JObject]].map { fj =>
        FileBlooms(
          (fj \ "path").extract[String],
          (fj \ "size").extract[Long],
          (fj \ "cols") match {
            case JObject(fields) =>
              fields.map { case (n, v) => n -> v.extract[String] }.toMap
            case _ => Map.empty
          })
      },
      // indexes written before sizing was recorded default to the build
      // default they were actually built with
      (j \ "bitsPerItem") match {
        case JInt(n) => n.toInt
        case _ => 10
      })
  }
}
