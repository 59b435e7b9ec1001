package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
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
  *    reaches the generator, spec-asserted),
  *  - filter pushdown: `SupportsPushDownFilters` — range predicates
  *    on the ordered `id` column narrow the generated key range at
  *    partition-planning time (the source-side analog of parquet
  *    row-group skipping: rows outside the range are never CREATED,
  *    let alone scanned). Non-range predicates stay residual on the
  *    Spark side, so correctness never depends on the source's
  *    filter handling being complete.
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SyntheticSource.FullSchema
  private var idLo: Long = 0L
  private var idHi: Long = rows
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty projections (e.g. count(*)) still need a non-zero-width
    // reader schema in this simple generator
    if (requiredSchema.nonEmpty) required = requiredSchema

  /** Accept range predicates on `id` (the generator's ordered key) by
    * intersecting them into [idLo, idHi); everything else is returned
    * as residual for Spark to evaluate post-scan. Accepted filters
    * are reported fully-handled — the narrowed range makes them true
    * by construction, so Spark can drop its own copy.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val num: PartialFunction[Any, Long] = {
      case n: java.lang.Number => n.longValue()
    }
    val (ok, residual) = filters.partition {
      case EqualTo("id", v) => num.isDefinedAt(v)
      case GreaterThan("id", v) => num.isDefinedAt(v)
      case GreaterThanOrEqual("id", v) => num.isDefinedAt(v)
      case LessThan("id", v) => num.isDefinedAt(v)
      case LessThanOrEqual("id", v) => num.isDefinedAt(v)
      case IsNotNull("id") => true // id is non-null by schema
      case _ => false
    }
    // saturating successor: v+1 on Long.MaxValue wraps to MinValue,
    // which would silently WIDEN a bound that was reported as fully
    // handled (e.g. id > MaxValue must yield the empty range, and
    // id <= MaxValue must stay all-rows)
    def succ(v: Long): Long =
      if (v == Long.MaxValue) Long.MaxValue else v + 1
    ok.foreach {
      case EqualTo("id", v) =>
        idLo = math.max(idLo, num(v)); idHi = math.min(idHi, succ(num(v)))
      case GreaterThan("id", v) =>
        // id > MaxValue is unsatisfiable: empty the range explicitly
        // (succ saturates, so bump hi down instead of lo up)
        if (num(v) == Long.MaxValue) idHi = idLo
        else idLo = math.max(idLo, num(v) + 1)
      case GreaterThanOrEqual("id", v) => idLo = math.max(idLo, num(v))
      case LessThan("id", v) => idHi = math.min(idHi, num(v))
      case LessThanOrEqual("id", v) => idHi = math.min(idHi, succ(num(v)))
      case IsNotNull("id") => ()
      case _ => ()
    }
    accepted = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new SyntheticScan(idLo, math.max(idLo, idHi), numPartitions, required)
}

case class SyntheticRange(start: Long, end: Long) extends InputPartition

class SyntheticScan(lo: Long, hi: Long, numPartitions: Int,
    schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  /** Shows the (possibly filter-narrowed) generated range in explain
    * output — the spec asserts pushdown actually reached the source
    * through this string.
    */
  override def description(): String =
    s"graft-synthetic range=[$lo,$hi) cols=${schema.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    val step = math.max(1L, (n + numPartitions - 1) / numPartitions)
    (lo until hi by step)
      .map(s => SyntheticRange(s, math.min(s + step, hi)))
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
