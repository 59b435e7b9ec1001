package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable THETA sketches — distinct-count summaries that, unlike
  * HLL, support the full SET ALGEBRA: union, intersection and
  * difference of the underlying distinct sets, all on the compact
  * sketch form without touching raw data.
  *
  * Why this matters at 100 TB: "distinct users who did A AND B"
  * (funnel conversion, audience overlap, retention) is NOT computable
  * from per-segment HLL counts — HLL unions, but inclusion-exclusion
  * over many segments explodes and subtraction amplifies error. A
  * theta sketch retains a uniform hash SAMPLE of the distinct set
  * (nominal k entries below threshold θ), so set operations compose
  * sketch-to-sketch: stored per-segment sketches answer any overlap
  * query after the fact, the same persistence discipline as the
  * HLL/KLL rollups (ops/Skew.scala). Library: the same
  * datasketches-java that backs Spark's hll_sketch_agg.
  *
  * The aggregation buffer is a LIVE theta Union gadget (it accepts
  * raw datum updates directly); Java-serialization to the union's
  * byte image happens only at exchange boundaries, not per row —
  * the KllQuantiles.Holder discipline.
  *
  * Determinism: a theta sketch is a pure function of the input SET
  * (hashes below θ), and union/intersection are order-independent,
  * so results are stable under any partitioning — but estimates are
  * still approximate ⇒ rows-only for the driver, with the spec
  * pinning exact-vs-estimate error inside the published bound.
  */
object ThetaSketches {

  /** lgK = 12 → 4096 nominal entries, relative standard error
    * 1/sqrt(4096) ≈ 1.6% on the union path.
    */
  val LgK = 12

  private def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(LgK).buildUnion()

  /** Live-union holder; serializes via the union's own byte image so
    * the gadget survives exchange boundaries updatable.
    */
  final class Holder(@transient var u: Union) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = u.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit =
      u = SetOperation.heapify(Memory.wrap {
        val b = new Array[Byte](in.readInt()); in.readFully(b); b
      }).asInstanceOf[Union]
  }

  private def holderEnc: Encoder[Holder] =
    Encoders.javaSerialization(classOf[Holder])

  /** long key column → compact theta sketch bytes (per-group build). */
  object SketchAgg extends Aggregator[Long, Holder, Array[Byte]] {
    def zero: Holder = new Holder(newUnion())
    def reduce(b: Holder, v: Long): Holder = { b.u.update(v); b }
    def merge(x: Holder, y: Holder): Holder = {
      x.u.union(y.u.getResult); x
    }
    def finish(b: Holder): Array[Byte] =
      b.u.getResult.toByteArray
    def bufferEncoder: Encoder[Holder] = holderEnc
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private def wrap(bytes: Array[Byte]): Sketch =
    Sketch.wrap(Memory.wrap(bytes))

  /** |A| estimate from compact sketch bytes. */
  def estimate(a: Array[Byte]): Double = wrap(a).getEstimate

  /** |A ∪ B| estimate, sketch-to-sketch. */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u = newUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.getEstimate
  }

  /** |A ∩ B| estimate — the operation HLL cannot do. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().setLogNominalEntries(LgK)
      .buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  /** |A \ B| estimate (set difference). */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b)).getEstimate
}
