package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Fused media-byte kernels.
  *
  * Why custom: the binary-column frame loop previously ran as typed
  * `mapPartitions`, which severs whole-stage codegen around the media
  * scan and pays an encoder round-trip per frame row. Like
  * ChunkFingerprints, the whole frame sweep runs here in one tight
  * JVM loop per document and participates in WSCG — a real build
  * swaps the byte math for PCM decode + RMS, keeping this shape.
  */

/** Per-document frame-energy rollup over a binary payload windowed
  * into `frameLen`-byte frames: energy(frame) = Σ byte² (unsigned),
  * returned as struct(n_frames, sum_energy, max_energy). Identical
  * arithmetic to the former per-frame mapPartitions loop, minus the
  * frame-row materialization and the per-doc shuffle it forced.
  */
case class FrameEnergyStats(child: Expression, frameLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("sum_energy", LongType, nullable = false),
    StructField("max_energy", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    FrameEnergyStats.compute(input.asInstanceOf[Array[Byte]], frameLen)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FrameEnergyStats.compute($c, $frameLen);")

  override protected def withNewChildInternal(c: Expression): FrameEnergyStats =
    copy(child = c)
}

object FrameEnergyStats {
  /** Static hot path — called from both eval and generated code. */
  def compute(b: Array[Byte], frameLen: Int): InternalRow = {
    val nFrames = (b.length + frameLen - 1) / frameLen
    var sum = 0L
    var max = 0L
    var i = 0
    while (i < nFrames) {
      var e = 0L
      var j = i * frameLen
      val end = math.min(j + frameLen, b.length)
      while (j < end) {
        val u = java.lang.Byte.toUnsignedInt(b(j)).toLong
        e += u * u
        j += 1
      }
      sum += e
      if (e > max) max = e
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nFrames.toLong, sum, max))
  }
}

object MediaFunctions {
  import org.apache.spark.sql.GraftColumnBridge._

  def frame_energy_stats(media: Column, frameLen: Int): Column =
    column(FrameEnergyStats(expression(media), frameLen))
}
