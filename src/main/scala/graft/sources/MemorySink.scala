package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK (`format("graft-memsink")`) — the write half of
  * the connector surface, exercising the full DSv2 batch commit
  * protocol:
  *
  *  - executor-side `DataWriter`s buffer their partition's rows and
  *    emit them as `WriterCommitMessage`s on task commit (speculative
  *    or failed tasks abort and their buffers are dropped — the
  *    exactly-once story),
  *  - the driver-side `BatchWrite.commit` publishes ALL partitions'
  *    messages atomically into the named in-memory table — nothing is
  *    visible until every task has committed.
  *
  * The in-memory store stands in for a real sink's manifest commit
  * (files/offsets in the messages instead of rows); buffered-rows
  * messages are only sane for small results, which is exactly the
  * aggregate-export shape the demo query writes. Supports LONG /
  * DOUBLE / STRING columns.
  */
class MemorySink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-memsink"

  // write-only source: schema comes from the written DataFrame
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MemSinkTable(opts.get("table"), schema)
  }
}

object MemorySink {
  /** name → (schema, committed rows). Driver-side store published
    * atomically by BatchWrite.commit.
    */
  private[sources] val tables =
    TrieMap.empty[String, (StructType, Array[Array[Any]])]

  def rowsOf(name: String): Option[(StructType, Array[Array[Any]])] =
    tables.get(name)

  /** Drop a committed table (test/demo hygiene: append mode is
    * cumulative by design, so idempotent demos clear first).
    */
  def drop(name: String): Unit = { tables.remove(name): Unit }
}

private[sources] class MemSinkTable(tableName: String,
    tableSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = s"graft-memsink:$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var truncateFirst = false
      // SaveMode.Overwrite plans OverwriteByExpression(alwaysTrue),
      // which Spark lowers to this call when the builder supports it
      override def truncate(): WriteBuilder = { truncateFirst = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemSinkBatchWrite(tableName, info.schema(), truncateFirst)
      }
    }
}

/** Commit message: the partition's buffered rows (a real sink ships
  * file paths/offsets here instead).
  */
private[sources] case class RowsMessage(partitionId: Int,
    rows: Array[Array[Any]]) extends WriterCommitMessage

private[sources] class MemSinkBatchWrite(name: String, schema: StructType,
    truncateFirst: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new MemSinkWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // atomic publish: all partitions or nothing. Append mode merges
    // with previously committed rows; truncate (SaveMode.Overwrite)
    // replaces the table. The merge is a CAS loop — a plain
    // get-then-put is a read-modify-write that loses a concurrent
    // committer's batch — and an append against a different schema
    // is refused rather than silently pairing old rows with the new
    // schema.
    val batch = messages.collect { case RowsMessage(_, rs) => rs }.flatten
    if (truncateFirst) {
      MemorySink.tables.put(name, (schema, batch)): Unit
    } else {
      var done = false
      while (!done) {
        MemorySink.tables.get(name) match {
          case None =>
            done = MemorySink.tables.putIfAbsent(
              name, (schema, batch)).isEmpty
          case Some(prior @ (priorSchema, priorRows)) =>
            require(priorSchema == schema,
              s"graft-memsink: append schema $schema does not match " +
                s"committed schema $priorSchema for table $name")
            done = MemorySink.tables.replace(
              name, prior, (schema, priorRows ++ batch))
        }
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class MemSinkWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]

    override def write(record: InternalRow): Unit =
      buf += schema.fields.zipWithIndex.map { case (f, i) =>
        if (record.isNullAt(i)) null
        else f.dataType match {
          case LongType   => Long.box(record.getLong(i))
          case DoubleType => Double.box(record.getDouble(i))
          case StringType => record.getUTF8String(i).toString
          case dt => throw new IllegalArgumentException(
            s"graft-memsink supports long/double/string, got $dt")
        }
      }

    override def commit(): WriterCommitMessage =
      RowsMessage(partitionId, buf.toArray)

    override def abort(): Unit = buf.clear()
    override def close(): Unit = ()
  }
}
