package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 synthetic-dimension source (`format("graft.sources.
  * RangeSource")`): `n` generated rows `id ∈ [0, n)` with derived columns
  *
  *   id LONG, square LONG (= id²), bucket INT (= id % 16),
  *   label STRING (= "row-" || id)
  *
  * built to exercise the full connector read path the way a real warehouse
  * source would at 100 TB:
  *
  *  - **planInputPartitions**: `slices` independent id sub-ranges — the
  *    generator never materializes on the driver and each executor slice is
  *    O(1) state (two longs), the contract any scalable source must honor.
  *  - **SupportsPushDownFilters**: range predicates on `id` (=, <, <=, >,
  *    >=) TIGHTEN THE GENERATED BOUNDS — pushed filters delete work at the
  *    source (the DSv2 analogue of parquet row-group pruning); everything
  *    else stays residual for Spark to evaluate.
  *  - **SupportsPushDownRequiredColumns**: the reader materializes only the
  *    pruned schema — `select(bucket)` never renders a label string.
  *
  * The source is deterministic, so the driver gate can mirror it with
  * DuckDB's `range()` (q212).
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeTable(
      properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("square", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("label", StringType, nullable = false)))
}

private[sources] class RangeTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($n)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(n, slices)
}

private[sources] class RangeScanBuilder(n: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L // inclusive
  private var hi = n // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      // literal type is whatever the analyzer boxed (Integer for small
      // literals, Long otherwise) — accept any integral rendering
      case EqualTo("id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1); true
      case GreaterThan("id", v: Number) => lo = math.max(lo, v.longValue + 1); true
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue); true
      case LessThan("id", v: Number) => hi = math.min(hi, v.longValue); true
      case LessThanOrEqual("id", v: Number) => hi = math.min(hi, v.longValue + 1); true
      case _ => false
    }
    pushed = accepted
    residual // Spark re-evaluates only what the source did not absorb
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RangeScan(lo, hi, slices, required)
}

private[sources] class RangeScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-range [$lo, $hi) slices=$slices cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    RangeScan.slicePartitions(lo, hi, slices)

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)

  // ---- streaming read: the same generator consumed as a micro-batch
  // stream. Offsets are plain row positions, so a restart resumes exactly
  // where the committed offset left off — replayable-source semantics with
  // zero per-batch state beyond two longs.
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, slices, required)
}

private[sources] object RangeScan {
  def slicePartitions(lo: Long, hi: Long, slices: Int): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val k = math.max(1, math.min(slices.toLong, span)).toInt
    (0 until k).map { i =>
      // contiguous slices, remainder spread over the first slices
      val base = span / k; val rem = span % k
      val start = lo + i * base + math.min(i, rem)
      val len = base + (if (i < rem) 1 else 0)
      RangePartition(start, start + len): InputPartition
    }.toArray
  }
}

private[sources] case class RangeOffset(pos: Long) extends streaming.Offset {
  override def json(): String = pos.toString
}

private[sources] class RangeMicroBatchStream(
    lo: Long, hi: Long, slices: Int, required: StructType)
    extends streaming.MicroBatchStream {
  override def initialOffset(): streaming.Offset = RangeOffset(lo)
  override def latestOffset(): streaming.Offset = RangeOffset(hi)
  override def deserializeOffset(json: String): streaming.Offset =
    RangeOffset(json.trim.toLong)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(
      start: streaming.Offset, end: streaming.Offset): Array[InputPartition] =
    RangeScan.slicePartitions(
      start.asInstanceOf[RangeOffset].pos, end.asInstanceOf[RangeOffset].pos, slices)

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)
}

private[sources] case class RangePartition(from: Long, until: Long) extends InputPartition

private[sources] class RangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.from - 1
      override def next(): Boolean = { cur += 1; cur < p.until }
      override def get(): InternalRow = InternalRow.fromSeq(required.fieldNames.toSeq.map {
        case "id" => cur
        case "square" => cur * cur
        case "bucket" => (cur % 16).toInt
        case "label" => UTF8String.fromString(s"row-$cur")
      })
      override def close(): Unit = ()
    }
  }
}
