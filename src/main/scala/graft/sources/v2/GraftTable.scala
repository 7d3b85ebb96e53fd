package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory v2 Table with batch read/write AND row-level operations, so
  * `MERGE INTO graft.t USING src ON ... WHEN MATCHED ...` plans natively
  * (group-based ReplaceData; the whole table is one group, so the rewrite
  * produced by Spark's MERGE rewrite replaces the table content
  * atomically on commit).
  *
  * Thread-safety: mutations replace the row array under the table lock at
  * COMMIT time only — readers snapshot the array when planning. */
class GraftTable(tableName: String, tableSchema: StructType)
  extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  @volatile private var rows: Array[InternalRow] = Array.empty

  def snapshot(): Array[InternalRow] = rows
  private[v2] def replaceAll(newRows: Array[InternalRow]): Unit =
    synchronized { rows = newRows }
  private[v2] def appendAll(newRows: Array[InternalRow]): Unit =
    synchronized { rows = rows ++ newRows }

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  // ---------------------------------------------------------------- read

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftScan(tableSchema, snapshot())

  // --------------------------------------------------------------- write

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doReplace = false
      override def truncate(): WriteBuilder = { doReplace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftBatchWrite(GraftTable.this, replace = doReplace, tableSchema)
      }
    }

  // --------------------------------------------- row-level ops (MERGE)

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        () => new GraftScan(tableSchema, snapshot())
      override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
            // ReplaceData over a single group == replace the whole table.
            // When the connector declares no metadata attributes, Spark's
            // ReplaceDataExec uses the plain writing task and hands rows in
            // the MergeRows output shape, WITH the __row_operation column —
            // the writer must strip it (and defensively skip DELETE ops).
            override def toBatch: BatchWrite =
              new GraftBatchWrite(GraftTable.this, replace = true, tableSchema)
          }
        }
    }
}

/** Whole-table scan: one input partition carrying a row snapshot. */
private[v2] class GraftScan(schema: StructType, data: Array[InternalRow])
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftInputPartition(data))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val it = p.asInstanceOf[GraftInputPartition].rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
    }
}

private[v2] case class GraftInputPartition(rows: Array[InternalRow]) extends InputPartition

/** Collect written rows via commit messages; commit replaces or appends.
  * Incoming rows may carry Spark's `__row_operation` column (row-level op
  * writes without metadata projections) — those rows are normalized to the
  * table schema and DELETE-op rows are skipped. */
private[v2] class GraftBatchWrite(table: GraftTable, replace: Boolean,
                                  tableSchema: StructType) extends BatchWrite {
  private val colTypes = tableSchema.fields.map(_.dataType)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftWriterFactory(colTypes)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val all = messages.collect { case GraftCommit(rs) => rs }.flatten
    if (replace) table.replaceAll(all) else table.appendAll(all)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[v2] case class GraftCommit(rows: Array[InternalRow]) extends WriterCommitMessage

/** Serializable executor-side writer: ships only column types, never the
  * table.
  *
  * Row shape is detected from arity, not from LogicalWriteInfo.schema():
  * Spark's group-based row-level writes (ReplaceDataExec) report the clean
  * table schema there, but when the connector declares no metadata
  * attributes the physical rows still arrive in the MergeRows output shape
  * `[__row_operation, ...tableCols]` (the plain DataWritingSparkTask branch
  * applies no projection). One extra leading field ⇒ strip it and skip
  * DELETE-op rows; exact arity ⇒ plain append rows. */
private[v2] case class GraftWriterFactory(colTypes: Array[org.apache.spark.sql.types.DataType])
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer[InternalRow]()
      override def write(record: InternalRow): Unit = {
        val shift = MergeRowShape.shiftOf(record, colTypes.length)
        if (!MergeRowShape.isDelete(record, shift)) {
          val r = record.copy()
          val values = Array.tabulate[Any](colTypes.length) { i =>
            if (r.isNullAt(i + shift)) null else r.get(i + shift, colTypes(i))
          }
          buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
        }
      }
      override def commit(): WriterCommitMessage = GraftCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
