package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.catalog.TableProvider
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.DataFrame

import graft.etl.{BloomSkipping, Skipping}

/** PLANNER-INTEGRATED data skipping (round 11): every read through this
  * source gets the stats-manifest + bloom-index pruning automatically and
  * plan-visibly, instead of through the opt-in
  * [[graft.etl.Skipping.readPrunedDetailed]] helper — the Delta behavior
  * the reference inherits from `USING DELTA`
  * (`notebooks/ETL_Entregas_Base.ipynb:582-585`), where stats pruning
  * rides the scan node of ANY query over the table.
  *
  * Architecture: everything is the stock parquet DataSource V2 —
  * [[ParquetTable]] (schema inference, partition discovery, column
  * pruning, parquet filter pushdown, vectorized read, whole-stage
  * codegen) — with ONE substitution: the table's [[GraftFileIndex]]
  * consults the side indexes inside `listFiles(partitionFilters,
  * dataFilters)`. `FileScan.partitions` derives its `InputPartition`s
  * from exactly that listing, so a pruned file never becomes an
  * InputPartition, never opens a footer, never schedules a task — the
  * property [[SourceV2Spec]] pins against `planInputPartitions`.
  *
  * The safety story is inherited unchanged from the helpers: Spark
  * re-applies the full predicate to every surviving row (V2 file sources
  * keep data filters as residuals), the manifest/bloom snapshots are
  * validated against THIS index's own live listing (set equality of
  * (relative path, size)) before a single stat is trusted, and every
  * undecidable shape keeps the file. A stale side index degrades to a
  * plain full parquet scan with a warning — performance, never rows.
  *
  * Usage: `spark.read.format("graft-parquet").load(root)` (registered via
  * META-INF/services), or [[GraftParquetSource.read]].
  */
final class GraftParquetSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-parquet"

  override def supportsExternalMetadata(): Boolean = true

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft-parquet reads one table root: spark.read.format(\"graft-parquet\").load(root)")
    p
  }

  // one table per provider instance (Spark calls inferSchema then
  // getTable on the SAME instance per read): without the cache, each
  // read pays TWO full recursive listings plus two side-index
  // parse-and-validate passes — at 100k files on an object store that
  // is tens of thousands of duplicate LIST calls (round-11 review)
  private var cachedPath: String = _
  private var cachedTable: GraftParquetTable = _

  private def table(options: CaseInsensitiveStringMap,
                    schema: Option[StructType]): GraftParquetTable =
    this.synchronized {
      val path = rootOf(options)
      if (cachedTable == null || cachedPath != path ||
          !schema.forall(_ == cachedTable.schema)) {
        cachedTable = new GraftParquetTable("graft-parquet",
          SparkSession.active, options, Seq(path), schema)
        cachedPath = path
      }
      cachedTable
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    table(options, None).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    table(new CaseInsensitiveStringMap(properties), Some(schema))
}

object GraftParquetSource {
  /** Convenience reader — the drop-in replacement for
    * `spark.read.parquet(root)` on a Writer-stamped root.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.format("graft-parquet").load(root)
}

/** Stock [[ParquetTable]] with the file index swapped for
  * [[GraftFileIndex]]: scan building, pushdown, and execution are all
  * inherited — pruning enters exclusively through the listing.
  */
class GraftParquetTable(
    name: String,
    sparkSession: SparkSession,
    options: CaseInsensitiveStringMap,
    paths: Seq[String],
    userSpecifiedSchema: Option[StructType])
  extends ParquetTable(name, sparkSession, options, paths, userSpecifiedSchema,
    classOf[ParquetFileFormat]) {

  override lazy val fileIndex: PartitioningAwareFileIndex = {
    // same parameter plumbing as FileTable's own index construction —
    // minus the glob handling: a graft root is one literal directory
    val parameters = options.asCaseSensitiveMap.asScala.toMap
    new GraftFileIndex(sparkSession, new HPath(paths.head), parameters,
      userSpecifiedSchema)
  }
}

/** [[InMemoryFileIndex]] that applies stats-manifest + bloom-index
  * pruning to the data filters the planner pushes into `listFiles`. Both
  * side indexes are snapshotted and validated ONCE per index instance
  * (i.e. once per read), against this index's own listing — the same
  * self-validation contract as [[Skipping.readPrunedDetailed]].
  */
final class GraftFileIndex(
    spark: SparkSession,
    rootPath: HPath,
    parameters: Map[String, String],
    userSpecifiedSchema: Option[StructType])
  extends InMemoryFileIndex(spark, Seq(rootPath), parameters, userSpecifiedSchema) {

  private val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val rootUri = fs.makeQualified(rootPath).toUri
  private val rootString = fs.makeQualified(rootPath).toString

  private def rel(p: HPath): String = rootUri.relativize(p.toUri).getPath

  /** Live (relative path, size) of every data file THIS index sees — the
    * listing the side indexes must match exactly to be trusted.
    */
  private lazy val liveFiles: Seq[(String, Long)] =
    allFiles().map(f => (rel(f.getPath), f.getLen))

  private lazy val statsByRel: Option[Map[String, Skipping.FileStats]] =
    Skipping.readManifest(fs, rootPath).flatMap { m =>
      // ONE trust gate, shared with readPrunedDetailed — the two paths
      // must never drift on what they trust (q377–q379 assert equality)
      Skipping.validatedManifest(m, liveFiles) match {
        case scala.util.Right(byRel) => Some(byRel)
        case scala.util.Left(reason) =>
          System.err.println(s"[graft.GraftFileIndex] WARNING: ignoring " +
            s"manifest at $rootString — $reason; reads fall back to a " +
            "plain parquet scan")
          None
      }
    }

  private lazy val bloomState
      : Option[(BloomSkipping.Prober, Map[String, BloomSkipping.FileBlooms])] =
    BloomSkipping.readIndex(fs, rootPath).flatMap { idx =>
      BloomSkipping.validated(idx, liveFiles, rootString).map { byPath =>
        (new BloomSkipping.Prober(idx,
          spark.sessionState.conf.sessionLocalTimeZone), byPath)
      }
    }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val total = base.iterator.map(_.files.size).sum
    val (pruned, statsKept) =
      if (dataFilters.isEmpty || statsByRel.isEmpty) (base, total)
      else {
        val pred = dataFilters.reduce(And)
        val stats = statsByRel.get
        // the bloom index is only opened for predicates with an equality
        // arm — a range-only predicate can never bloom-prune
        val bloom = if (Skipping.hasEqualityArm(pred)) bloomState else None
        var afterStats = 0
        val out = base.map { pd =>
          pd.copy(files = pd.files.filter { f =>
            val r = rel(f.getPath)
            val statsKeep = stats.get(r).forall(st => Skipping.mayMatch(pred, st))
            if (statsKeep) afterStats += 1
            statsKeep && bloom.forall { case (prober, byPath) =>
              byPath.get(r).forall(fb => Skipping.mayMatchBloom(pred, fb, prober))
            }
          })
        }
        (out, afterStats)
      }
    GraftFileIndex.lastPrune.put(rootString,
      (total, statsKept, pruned.iterator.map(_.files.size).sum))
    pruned
  }
}

object GraftFileIndex {
  /** Per-root (total files, kept after stats, kept after stats+bloom) of
    * the most recent `listFiles` — observability for gates and specs
    * (single-reader granularity; two concurrent reads of one root race
    * benignly on their own entries).
    */
  val lastPrune = new ConcurrentHashMap[String, (Int, Int, Int)]()

  /** The prune record for `root`, tolerant of scheme qualification (the
    * map is keyed by the qualified URI, e.g. `file:/tmp/x` for `/tmp/x`).
    * Matching is by URI PATH equality, not suffix — with two roots where
    * one path is a suffix of the other, an endsWith fallback could
    * return the wrong table's record and validate pruning that never
    * ran (round-11 review).
    */
  def pruneFor(root: String): (Int, Int, Int) = {
    val direct = lastPrune.get(root)
    if (direct != null) return direct
    def pathOf(s: String): String =
      try Option(new java.net.URI(s).getPath).getOrElse(s)
      catch { case _: Exception => s }
    val want = pathOf(root)
    val it = lastPrune.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (pathOf(e.getKey) == want) return e.getValue
    }
    throw new IllegalStateException(
      s"no graft-parquet prune record for $root — was the root read through " +
        "the V2 source in this session?")
  }
}
