package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for Census-API-shaped payload directories: each
  * file holds one JSON array-of-arrays response (row 0 = header,
  * reference `extractCensusACS5.py:26-34`), e.g. one staged file per
  * (year, measure) fetch.
  *
  * This is the scale-out form of S1 (SURVEY.md §2.1): ingest parallelism =
  * number of staged payload files — one InputPartition per file, decoded
  * on executors; only the header row is read on the driver (schema
  * inference). All cells surface as strings, exactly like the reference's
  * pandas frame; typing happens downstream at a declared schema.
  *
  * Usage: `spark.read.format("graft.sources.CensusSource")
  *   .option("path", dir).load()`
  */
class CensusSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CensusSource.headerSchema(options.get("path"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CensusTable(schema, properties.get("path"))
}

object CensusSource {
  private[sources] val mapper = new ObjectMapper

  private[sources] def listPayloads(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted.toSeq
  }

  private[sources] def parse(fs: FileSystem, file: String): Seq[Seq[String]] = {
    val in = fs.open(new Path(file))
    try {
      val root = mapper.readTree(in)
      (0 until root.size()).map { i =>
        val row = root.get(i)
        (0 until row.size()).map(j => row.get(j).asText())
      }
    } finally in.close()
  }

  /** Header = row 0 of the lexicographically first payload (all payloads
    * of one logical table share a header, as in the reference API). */
  def headerSchema(dir: String): StructType = {
    val files = listPayloads(dir)
    require(files.nonEmpty, s"no payload files under $dir")
    val p = new Path(files.head)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    val header = parse(fs, files.head).head
    StructType(header.map(name => StructField(name, StringType)))
  }
}

private class CensusTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"census($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new CensusScan(schema, path)
}

private class CensusScan(schema: StructType, path: String) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    CensusSource.listPayloads(path)
      .map(f => CensusInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new CensusReaderFactory(schema)
}

private case class CensusInputPartition(file: String) extends InputPartition

private class CensusReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[CensusInputPartition].file
    new PartitionReader[InternalRow] {
      private val fs = FileSystem.get(new Path(file).toUri,
        new org.apache.hadoop.conf.Configuration())
      // row 0 is the header — skip it; remaining rows are data
      private val it = CensusSource.parse(fs, file).drop(1).iterator
      private var cur: Seq[String] = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow =
        InternalRow.fromSeq(schema.indices.map(i =>
          if (i < cur.length) UTF8String.fromString(cur(i)) else null))
      override def close(): Unit = ()
    }
  }
}
