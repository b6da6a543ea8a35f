package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 facade for the REST ingestion layer (SURVEY §7.4 "custom
  * source adapter ... DSv2 facade"): `spark.read.format("graft.sources.RestSource")`.
  *
  * The unit of parallelism IS the fetch unit: one `InputPartition` per
  * response file (in production, per (symbol, request-window) — the output
  * of [[graft.gaps.GapEngine.fetchWindows]]), so Spark schedules fetches as
  * tasks, locality and retries included. Each partition yields raw
  * `(symbol, body)` rows; the per-exchange [[KlineAdapters]] normalization
  * then runs as ordinary codegen'd projections on top.
  *
  * In this zero-egress environment the "endpoint" is a directory of recorded
  * response files named `<symbol>.json` — the production variant swaps the
  * file read in [[RestPartitionReader]] for the rate-limited HTTP GET
  * (reference `_base_.py:55-98`); nothing else changes.
  */
class RestSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object RestSource {
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))
}

class RestTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"rest($path)"
  override def schema(): StructType = RestSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(path)
}

class RestScanBuilder(path: String) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = RestSource.schema
  override def description(): String = s"RestScan($path)"
  override def toBatch: Batch = new RestBatch(path)
}

/** One input partition per response file = per fetch unit. */
case class RestInputPartition(symbol: String, file: String)
    extends InputPartition

class RestBatch(path: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    files.map { f =>
      RestInputPartition(f.getName.stripSuffix(".json"), f.getAbsolutePath)
        : InputPartition
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory
}

class RestReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(p.asInstanceOf[RestInputPartition])
}

/** Production seam: replace the file read with the rate-limited HTTP call. */
class RestPartitionReader(p: RestInputPartition)
    extends PartitionReader[InternalRow] {
  private var consumed = false
  override def next(): Boolean = !consumed
  override def get(): InternalRow = {
    consumed = true
    val body = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.file)),
      java.nio.charset.StandardCharsets.UTF_8)
    InternalRow(UTF8String.fromString(p.symbol), UTF8String.fromString(body))
  }
  override def close(): Unit = ()
}
