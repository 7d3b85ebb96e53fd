package graft.sources.v2

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetWriter}
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Parquet-directory-backed v2 Table with batch read/write and row-level
  * operations: `MERGE INTO` runs against real parquet files — executors
  * read row groups and write replacement files directly (parquet-mr), the
  * driver commit atomically swaps the directory snapshot. No table data
  * ever sits in driver memory.
  *
  * Scope/caveats (documented, demo-grade group granularity):
  *  - the whole table is ONE rewrite group: a MERGE rewrites all files
  *    (correct semantics; per-file group pruning via runtime filtering is
  *    the production refinement);
  *  - single concurrent writer assumed (same as the parquet store);
  *  - supported column types: boolean/int/long/double/string/timestamp.
  *
  * Created through [[GraftCatalog]] with a LOCATION, e.g.
  * `CREATE TABLE graft.t (k BIGINT, v DOUBLE) LOCATION '/tmp/t'`.
  */
class GraftParquetTable(tableName: String, dir: String, tableSchema: StructType)
  extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  private def listFiles(): Array[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sortBy(identity)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftParquetScan(tableSchema, listFiles())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doReplace = false
      override def truncate(): WriteBuilder = { doReplace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftParquetBatchWrite(dir, tableSchema, replace = doReplace)
      }
    }

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        () => new GraftParquetScan(tableSchema, listFiles())
      override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite =
              new GraftParquetBatchWrite(dir, tableSchema, replace = true)
          }
        }
    }
}

private[v2] object ParquetCodec {
  /** Spark StructType → parquet MessageType (types listed in class doc). */
  def toMessageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val prim = f.dataType match {
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case LongType    => Types.optional(PrimitiveTypeName.INT64)
        case DoubleType  => Types.optional(PrimitiveTypeName.DOUBLE)
        case StringType  => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new UnsupportedOperationException(
          s"GraftParquetTable does not support column type ${other.simpleString}")
      }
      b.addField(prim.named(f.name))
    }
    b.named("graft_row")
  }

  /** Read every row of one parquet file into InternalRows (column lookup by
    * name so files written with a superset/reordered schema still read). */
  def readFile(file: String, schema: StructType): Iterator[InternalRow] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    val fileSchema = reader.getFooter.getFileMetaData.getSchema
    val colIdx = schema.fields.map(f =>
      if (fileSchema.containsField(f.name)) fileSchema.getFieldIndex(f.name) else -1)
    val rows = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pages: PageReadStore = reader.readNextRowGroup()
    while (pages != null) {
      val columnIO = new ColumnIOFactory().getColumnIO(fileSchema)
      val recordReader = columnIO.getRecordReader(pages, new GroupRecordConverter(fileSchema))
      var i = 0L
      while (i < pages.getRowCount) {
        val g = recordReader.read()
        val values = Array.tabulate[Any](schema.length) { j =>
          val idx = colIdx(j)
          if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
          else schema.fields(j).dataType match {
            case BooleanType   => g.getBoolean(idx, 0)
            case IntegerType   => g.getInteger(idx, 0)
            case LongType      => g.getLong(idx, 0)
            case DoubleType    => g.getDouble(idx, 0)
            case StringType    => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
            case TimestampType => g.getLong(idx, 0) // micros
            case other => throw new UnsupportedOperationException(other.simpleString)
          }
        }
        rows += new GenericInternalRow(values)
        i += 1
      }
      pages = reader.readNextRowGroup()
    }
    reader.close()
    rows.iterator
  }

  def newWriter(file: String, schema: StructType): (ParquetWriter[Group], SimpleGroupFactory, MessageType) = {
    val msgType = toMessageType(schema)
    val conf = new Configuration()
    GroupWriteSupport.setSchema(msgType, conf)
    val writer = ExampleParquetWriter.builder(new Path(file)).withConf(conf).build()
    (writer, new SimpleGroupFactory(msgType), msgType)
  }

  def appendRow(g: Group, row: InternalRow, schema: StructType, shift: Int): Unit = {
    var j = 0
    while (j < schema.length) {
      if (!row.isNullAt(j + shift)) schema.fields(j).dataType match {
        case BooleanType   => g.add(j, row.getBoolean(j + shift))
        case IntegerType   => g.add(j, row.getInt(j + shift))
        case LongType      => g.add(j, row.getLong(j + shift))
        case DoubleType    => g.add(j, row.getDouble(j + shift))
        case StringType    => g.add(j, row.getUTF8String(j + shift).toString)
        case TimestampType => g.add(j, row.getLong(j + shift))
        case other => throw new UnsupportedOperationException(other.simpleString)
      }
      j += 1
    }
  }
}

private[v2] class GraftParquetScan(schema: StructType, files: Array[String])
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => GraftFilePartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftParquetReaderFactory(schema)
}

private[v2] case class GraftFilePartition(file: String) extends InputPartition

private[v2] class GraftParquetReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = ParquetCodec.readFile(p.asInstanceOf[GraftFilePartition].file, schema)
      private var cur: InternalRow = _
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

/** Executors write staged parquet files; the driver commit swaps the
  * directory snapshot (replace) or moves files in (append). */
private[v2] class GraftParquetBatchWrite(dir: String, schema: StructType,
                                         replace: Boolean) extends BatchWrite {
  private val stagingDir = s"${dir}_staging_${java.util.UUID.randomUUID().toString.take(8)}"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftParquetWriterFactory(stagingDir, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val staging = new Path(stagingDir)
    val target = new Path(dir)
    val fs = staging.getFileSystem(conf)
    if (!fs.exists(staging)) fs.mkdirs(staging)
    if (replace) {
      val old = new Path(dir + "_old")
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(target) && !fs.rename(target, old))
        sys.error(s"snapshot swap failed for $dir")
      if (!fs.rename(staging, target)) { fs.rename(old, target); sys.error(s"publish failed for $dir") }
      if (fs.exists(old)) fs.delete(old, true)
    } else {
      if (!fs.exists(target)) fs.mkdirs(target)
      fs.listStatus(staging).foreach { st =>
        if (!fs.rename(st.getPath, new Path(target, st.getPath.getName)))
          sys.error(s"append move failed for ${st.getPath}")
      }
      fs.delete(staging, true)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(stagingDir)
    val fs = staging.getFileSystem(new Configuration())
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

/** Per-task parquet writer with the same MergeRows arity handling as the
  * in-memory table (strip `__row_operation`, skip DELETE rows). */
private[v2] case class GraftParquetWriterFactory(stagingDir: String, schema: StructType)
  extends DataWriterFactory {
  private val DeleteOp = org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var writer: ParquetWriter[Group] = _
      private var factory: SimpleGroupFactory = _
      private val file = s"$stagingDir/part-$partitionId-$taskId.parquet"

      override def write(record: InternalRow): Unit = {
        val shift = record.numFields - schema.length
        require(shift == 0 || shift == 1,
          s"unexpected write row arity ${record.numFields} for ${schema.length} columns")
        if (shift == 0 || record.getInt(0) != DeleteOp) {
          if (writer == null) {
            val (w, f, _) = ParquetCodec.newWriter(file, schema)
            writer = w; factory = f
          }
          val g = factory.newGroup()
          ParquetCodec.appendRow(g, record, schema, shift)
          writer.write(g)
        }
      }
      override def commit(): WriterCommitMessage = {
        if (writer != null) writer.close()
        GraftCommit(Array.empty)
      }
      override def abort(): Unit = if (writer != null) writer.close()
      override def close(): Unit = ()
    }
}
