package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact grouped top-K as a TypedImperativeAggregate: a bounded
  * K-element heap per group, merged across partitions — the
  * engine-grade alternative to `row_number() OVER (...) <= K`, which
  * must SORT every row of every group. This buffer keeps K elements
  * per group regardless of group size, combines map-side, and its
  * merge is associative — at 100 TB each map task contributes at most
  * K rows per group to the shuffle.
  *
  * Input: struct(value DOUBLE, id LONG); output: ARRAY<LONG> of the
  * ids of the K largest (value, then smallest id on ties) — fully
  * deterministic, so the result is DuckDB-oracle-checkable.
  */
case class TopKByValue(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // input must be struct(DOUBLE, LONG) — callers cast explicitly (the
  // ImplicitCastInputTypes route is private[sql] in Spark 4)
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  /** Max-heap by "badness": head is the WORST kept element — smaller
    * value, then larger id.
    */
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row != null) {
      buf.enqueue((row.getDouble(0), row.getLong(1)))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { e =>
      a.enqueue(e)
      if (a.size > k) a.dequeue()
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy { case (v, id) => (-v, id) }
    new GenericArrayData(best.map(_._2))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByValue =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByValue =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByValue = copy(child = c.head)
  override def prettyName: String = "top_k_by_value"
}

object TopKByValue {
  import org.apache.spark.sql.GraftColumnBridge

  /** top_k_by_value(struct(value, id), k) → array of the top-k ids. */
  def top_k_by_value(valueAndId: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByValue(GraftColumnBridge.expression(valueAndId), k)
        .toAggregateExpression())
}
