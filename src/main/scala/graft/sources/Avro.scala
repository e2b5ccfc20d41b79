package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file sink + DSv2 source built directly on avro-core
  * (the `avro-1.12.1.jar` Spark itself ships; the separate `spark-avro`
  * data-source module is NOT on this classpath, so the at-rest format
  * family — CSV / Parquet / ORC / JSONL / Avro — is completed here with
  * first-party plumbing, the [[CensusSource]] discipline).
  *
  * Sink: one container file per non-empty upstream partition
  * (`foreachPartition` → Hadoop FS stream → `DataFileWriter`), schema
  * derived from the frame's Catalyst schema (long / int / double /
  * string / boolean, nullability as `union[null, T]`). Source: one
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
    * non-empty partition. The Avro schema travels as its JSON rendering
    * (avro Schema is not serializable-by-contract across versions). */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = toAvro(df.schema, "row").toString
    val names = df.schema.fieldNames
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val p = new Path(s"$path/part-$pid.avro")
        // temp-file + rename commit: under task retry / speculative
        // execution two attempts of the same partition may run
        // concurrently — each writes its own attempt-unique temp file in
        // full, then atomically renames over the final name, so the
        // container is never interleaved by two writers (last complete
        // attempt wins)
        val tmp = new Path(
          s"$path/.part-$pid-attempt-${tc.attemptNumber()}.avro.tmp")
        val fs = FileSystem.get(p.toUri,
          new org.apache.hadoop.conf.Configuration())
        val out = fs.create(tmp, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            rec.put(names(i), row.get(i) match {
              case null => null
              case s: String => s
              case v => v
            })
            i += 1
          }
          w.append(rec)
        } finally w.close() // closes the stream
        if (fs.exists(p)) fs.delete(p, false)
        if (!fs.rename(tmp, p))
          throw new java.io.IOException(s"avro sink: commit rename " +
            s"$tmp -> $p failed")
      }
    }
  }

  private[sources] def listFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    fs.listStatus(p).filter(st => st.isFile &&
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
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AvroTable(schema, AvroIo.listFiles(properties.get("path")))
}

private class AvroTable(schema: StructType, locs: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"avro(${locs.headOption.getOrElse("")}${
    if (locs.size > 1) s",+${locs.size - 1}" else ""})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new AvroScan(schema, locs)
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
