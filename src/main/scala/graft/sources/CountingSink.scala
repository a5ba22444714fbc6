package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The write half of the connector surface: a DataSource V2 audit sink
  * (`format("graft.sources.CountingSink")`, option `tag`) that exercises the
  * full BatchWrite protocol — per-task [[DataWriter]]s count rows, each task
  * `commit()` emits a [[WriterCommitMessage]], and the DRIVER-side
  * `BatchWrite.commit` folds the messages into the per-tag total. Only
  * committed tasks count: a speculative/retried task that aborts never
  * reaches the fold, which is exactly the exactly-once accounting contract a
  * real sink's commit protocol must honor (the reason sinks aggregate
  * commit messages instead of having tasks bump a shared counter).
  *
  * Results land in a process-local registry ([[CountingSink.total]]) — this
  * sink is for pipelines that need a row-count audit of an otherwise
  * discarded write (dry runs, count-only validation passes).
  */
class CountingSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CountingTable(schema, properties.getOrDefault("tag", "default"))
}

object CountingSink {
  private val totals = new ConcurrentHashMap[String, Long]()
  def total(tag: String): Long = totals.getOrDefault(tag, -1L)
  private[sources] def record(tag: String, n: Long): Unit = totals.put(tag, n)
}

private[sources] class CountingTable(writeSchema: StructType, tag: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_counting_sink($tag)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CountingBatchWrite(tag)
      }
    }
}

private[sources] class CountingBatchWrite(tag: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CountingWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    CountingSink.record(tag, messages.map(_.asInstanceOf[CountMsg].n).sum)

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class CountMsg(n: Long) extends WriterCommitMessage

private[sources] class CountingWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = CountMsg(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
