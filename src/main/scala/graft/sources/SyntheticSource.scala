package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector: a deterministic synthetic event generator
  * (`format("graft-synthetic")`) — the engine's "custom connector"
  * surface, exercising the full DSv2 contract:
  *
  *  - `TableProvider`/`SupportsRead` registration (+ DataSourceRegister
  *    so the short name resolves via META-INF/services),
  *  - REAL partition planning: `numPartitions` InputPartitions, each
  *    generating its own disjoint id range executor-side (nothing is
  *    materialized on the driver — this is how a 100 TB source
  *    parallelizes),
  *  - column pruning: `SupportsPushDownRequiredColumns` — a query
  *    projecting 2 of 4 columns generates rows of width 2 (pruning
  *    reaches the generator, spec-asserted).
  *
  * Row i (0 ≤ i < rows): id=i, bucket=i%97, value=(i*31)%1000,
  * tag='t'||i%10 — pure integer arithmetic, so the DuckDB oracle
  * replays it from generate_series and the driver hash-compare
  * verifies the connector end-to-end.
  */
class SyntheticSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synthetic"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.FullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive case-preserved here (unlike inferSchema's map)
    val opts = new CaseInsensitiveStringMap(properties)
    new SyntheticTable(
      opts.getLong("rows", 1000L),
      opts.getInt("numpartitions", 4))
  }
}

object SyntheticSource {
  val FullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("tag", org.apache.spark.sql.types.StringType,
      nullable = false)))

  /** Column value for row i — the single source of truth the reader
    * evaluates per projected column.
    */
  def colValue(name: String, i: Long): Any = name match {
    case "id"     => i
    case "bucket" => i % 97
    case "value"  => (i * 31) % 1000
    case "tag"    => UTF8String.fromString("t" + (i % 10))
  }
}

class SyntheticTable(rows: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synthetic($rows)"
  override def schema(): StructType = SyntheticSource.FullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, numPartitions)
}

class SyntheticScanBuilder(rows: Long, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SyntheticSource.FullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projections (e.g. count(*)) still need a non-zero-width
    // reader schema in this simple generator
    if (requiredSchema.nonEmpty) required = requiredSchema

  override def build(): Scan = new SyntheticScan(rows, numPartitions, required)
}

case class SyntheticRange(start: Long, end: Long) extends InputPartition

class SyntheticScan(rows: Long, numPartitions: Int, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val step = math.max(1L, (rows + numPartitions - 1) / numPartitions)
    (0L until rows by step)
      .map(s => SyntheticRange(s, math.min(s + step, rows)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(schema.fieldNames)
}

class SyntheticReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SyntheticRange]
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map(SyntheticSource.colValue(_, i)))
      override def close(): Unit = ()
    }
  }
}
