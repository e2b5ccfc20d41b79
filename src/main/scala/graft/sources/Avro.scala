package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file sink + DSv2 source built directly on avro-core
  * (the `avro-1.12.1.jar` Spark itself ships; the separate `spark-avro`
  * data-source module is NOT on this classpath, so the at-rest format
  * family — CSV / Parquet / ORC / JSONL / Avro — is completed here with
  * first-party plumbing, the [[CensusSource]] discipline).
  *
  * Sink: a DSv2 `BatchWrite` (see [[AvroBatchWrite]] for the commit
  * protocol) producing one container file per non-empty upstream
  * partition, schema derived from the frame's Catalyst schema (long /
  * int / double / string / boolean, nullability as `union[null, T]`).
  * Source: one
  * `InputPartition` per file, schema read from the first file's
  * embedded header, rows streamed through `DataFileStream` on the
  * executor — never a whole-file byte blob.
  *
  * Scale note: Avro container files carry sync markers per block, so
  * the 100-TB read path splits one large file into (file, sync-range)
  * partitions; with this sink's one-file-per-partition layout the
  * per-file granularity already matches the write parallelism, which is
  * the case that matters for a staged round-trip.
  *
  * Usage: `AvroIo.write(df, dir)`;
  * `spark.read.format("graft.sources.AvroSource").option("path", dir).load()`.
  */
object AvroIo {

  private[sources] def toAvro(s: StructType, name: String): Schema = {
    val fields = s.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case other => throw new IllegalArgumentException(
          s"avro sink supports long/int/double/string/boolean, got $other")
      }
      val t = if (f.nullable)
        Schema.createUnion(util.Arrays.asList(
          Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  private[sources] def toCatalyst(s: Schema): StructType = {
    def unwrap(t: Schema): (Schema, Boolean) =
      if (t.getType == Schema.Type.UNION) {
        val nonNull = t.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"unsupported union $t")
        (nonNull.head, true)
      } else (t, false)
    StructType(s.getFields.asScala.map { f =>
      val (base, nullable) = unwrap(f.schema())
      val dt = base.getType match {
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.STRING => StringType
        case Schema.Type.BOOLEAN => BooleanType
        case other => throw new IllegalArgumentException(
          s"avro source supports long/int/double/string/boolean, got $other")
      }
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  /** Write `df` as Avro container files under `path`, one file per
    * non-empty partition — the DSv2 `BatchWrite` path ([[AvroBatchWrite]]:
    * task attempts write attempt-unique temp files; the DRIVER renames
    * the one committed attempt per partition after every task succeeded,
    * so a retried or speculative attempt can never race a rename or leak
    * a visible partial file). */
  def write(df: DataFrame, path: String): Unit =
    df.write.format("graft.sources.AvroSource")
      .option("path", path).mode("append").save()

  private[sources] def fsFor(path: String): FileSystem =
    FileSystem.get(new Path(path).toUri,
      new org.apache.hadoop.conf.Configuration())

  private[sources] def listFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsFor(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(st => st.isFile &&
        st.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted.toSeq
  }

  private[sources] def openStream(loc: String): DataFileStream[GenericRecord] = {
    val p = new Path(loc)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    new DataFileStream[GenericRecord](fs.open(p),
      new GenericDatumReader[GenericRecord]())
  }

  /** Embedded writer schema of the first file — all files of one logical
    * dataset share it (they came from one [[write]]). */
  private[sources] def headerSchema(locs: Seq[String]): StructType = {
    require(locs.nonEmpty, "no avro files")
    val in = openStream(locs.head)
    try toCatalyst(in.getSchema) finally in.close()
  }
}

class AvroSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroIo.headerSchema(AvroIo.listFiles(options.get("path")))
  // the WRITE path hands us the query's schema instead of inferring —
  // required for writing to a dir with no files yet
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    new AvroTable(schema, AvroIo.listFiles(path), path)
  }
}

private class AvroTable(schema: StructType, locs: Seq[String], path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"avro(${locs.headOption.getOrElse(path)}${
    if (locs.size > 1) s",+${locs.size - 1}" else ""})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new AvroScan(schema, locs)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AvroBatchWrite(info.schema(), path)
      }
    }
}

/** DSv2 batch-write with real commit semantics (the protocol the
  * pre-r16 `foreachPartition` sink approximated with executor-side
  * delete-then-rename, which raced under speculative execution and
  * leaked `.tmp` files on failed attempts):
  *
  *  - each task ATTEMPT writes an attempt-unique temp file
  *    (`.part-<pid>-task-<taskId>.avro.tmp`) in full;
  *  - `DataWriter.commit()` only REPORTS the temp path (Spark's commit
  *    coordinator guarantees at most one attempt per partition commits);
  *  - the DRIVER's `BatchWrite.commit` renames the winning temps to
  *    their final `part-<pid>.avro` names after every task succeeded —
  *    single-threaded, so no rename ever races another attempt;
  *  - `DataWriter.abort` (failed/losing attempt) and `BatchWrite.abort`
  *    (failed job) delete their temp files.
  *
  * A reader never observes a partial file: only `*.avro` names are
  * listed, and those appear solely via the driver's post-success
  * renames. `AvroWriteProtocolSpec` drives retry, speculation-loser and
  * job-abort schedules against this directly. */
private class AvroBatchWrite(schema: StructType, path: String)
    extends BatchWrite {
  private val schemaJson = AvroIo.toAvro(schema, "row").toString
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(schemaJson, schema, path)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = AvroIo.fsFor(path)
    var committed = 0
    messages.foreach {
      case AvroCommitMessage(Some(tmp), pid) =>
        val dest = new Path(s"$path/part-$pid.avro")
        if (fs.exists(dest)) fs.delete(dest, false) // idempotent re-run
        if (!fs.rename(new Path(tmp), dest))
          throw new java.io.IOException(
            s"avro sink: commit rename $tmp -> $dest failed")
        committed += 1
      case _ => () // empty partition (None) or missing message
    }
    // An all-empty write still commits ONE schema-bearing empty
    // container: the source infers schema from the first file's header,
    // so a zero-row dataset must stay readable (a fresh partition that
    // happened to be empty would otherwise poison the downstream read —
    // found by the r16 adversarial empty-corpus sweep). Driver-side and
    // post-success, so the no-partial-file invariant holds unchanged.
    if (committed == 0) {
      val dest = new Path(s"$path/part-0.avro")
      if (!fs.exists(dest)) {
        val avro = new Schema.Parser().parse(schemaJson)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avro))
        w.create(avro, fs.create(dest, true))
        w.close()
      }
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = AvroIo.fsFor(path)
    messages.foreach {
      case AvroCommitMessage(Some(tmp), _) =>
        try fs.delete(new Path(tmp), false)
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
  }
}

private case class AvroCommitMessage(tmp: Option[String], pid: Int)
    extends WriterCommitMessage

private class AvroWriterFactory(schemaJson: String, schema: StructType,
    path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(schemaJson, schema, path, partitionId, taskId)
}

private class AvroDataWriter(schemaJson: String, schema: StructType,
    path: String, pid: Int, taskId: Long) extends DataWriter[InternalRow] {
  private var avro: Schema = _
  private var w: DataFileWriter[GenericRecord] = _
  private var tmp: Path = _
  // lazy open: empty partitions produce NO file (one file per non-empty
  // partition, the sink's declared layout)
  private def ensureOpen(): Unit = if (w == null) {
    avro = new Schema.Parser().parse(schemaJson)
    tmp = new Path(s"$path/.part-$pid-task-$taskId.avro.tmp")
    val out = AvroIo.fsFor(path).create(tmp, true)
    w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avro))
    w.create(avro, out)
  }
  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < schema.length) {
      rec.put(schema(i).name,
        if (row.isNullAt(i)) null
        else schema(i).dataType match {
          case LongType => java.lang.Long.valueOf(row.getLong(i))
          case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
          case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
          case StringType => row.getUTF8String(i).toString
          case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
          case other => throw new IllegalArgumentException(
            s"avro sink supports long/int/double/string/boolean, got $other")
        })
      i += 1
    }
    w.append(rec)
  }
  override def commit(): WriterCommitMessage =
    if (w != null) {
      w.close() // closes the stream; file is complete but still .tmp
      w = null
      AvroCommitMessage(Some(tmp.toString), pid)
    } else AvroCommitMessage(None, pid)
  override def abort(): Unit = if (w != null) {
    try w.close() catch { case _: java.io.IOException => () }
    w = null
    try AvroIo.fsFor(path).delete(tmp, false)
    catch { case _: java.io.IOException => () }
  }
  override def close(): Unit = ()
}

private class AvroScan(schema: StructType, locs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    locs.map(f => AvroInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(schema)
}

private case class AvroInputPartition(loc: String) extends InputPartition

private class AvroReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val loc = p.asInstanceOf[AvroInputPartition].loc
    new PartitionReader[InternalRow] {
      private val stream = AvroIo.openStream(loc)
      private var cur: GenericRecord = _
      override def next(): Boolean = {
        val h = stream.hasNext
        if (h) cur = stream.next()
        h
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(schema.fields.toSeq.map { f =>
          cur.get(f.name) match {
            case null => null
            case u: org.apache.avro.util.Utf8 =>
              UTF8String.fromString(u.toString)
            case s: String => UTF8String.fromString(s)
            case v => v
          }
        })
      override def close(): Unit = stream.close()
    }
  }
}
