package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused vector kernels for the embedding-similarity surface.
  *
  * Why custom: the declarative forms build on higher-order functions
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`), and HOF lambdas
  * evaluate INTERPRETED — per-element virtual calls and boxing on
  * every row (the same trap measured >100× slow on the minhash path,
  * see TextExpressions). These expressions run the identical
  * left-to-right folds in one tight JVM loop and participate in
  * whole-stage codegen, so results are BIT-IDENTICAL to both the
  * declarative form and DuckDB's list_dot_product fold — only faster.
  */

/** Σ a_i·b_i over two double arrays (sequential fold). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
}

object DotProduct {
  /** Static hot path — called from both eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** cos(a,b) = dot(a,b) / (‖a‖·‖b‖), all three folds in one pass.
  * Each accumulator folds left-to-right independently, so the result
  * is bit-equal to composing the separate declarative folds.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
}

object CosineSim {
  /** Static hot path — called from both eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** The `nprobe` nearest centroids of a vector by cosine (descending,
  * centroid-index ascending on ties), as an int array.
  *
  * The centroid matrix enters the plan as ONE nested-array literal
  * (`typedLit(Seq[Seq[Double]])`): the generated code references it
  * as a constant object, so the compiled source is IDENTICAL across
  * k-means iterations and Janino's cache compiles the plan once —
  * unlike k inline 64-element literal arrays, which force a fresh
  * multi-second codegen per iteration.
  */
case class NearestCentroids(left: Expression, right: Expression, nprobe: Int)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any, m: Any): Any =
    NearestCentroids.compute(
      v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData], nprobe)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = graft.functions.NearestCentroids.compute($v, $m, $nprobe);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestCentroids = copy(left = l, right = r)
}

object NearestCentroids {
  /** Static hot path — called from both eval and generated code. */
  def compute(v: ArrayData, m: ArrayData,
      nprobe: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val k = m.numElements()
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      sims(c) = CosineSim.compute(v, m.getArray(c))
      c += 1
    }
    val ids = (0 until k).sortBy(c => (-sims(c), c)).take(nprobe)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ids.toArray[Any])
  }
}

/** Sign-random-projection bucket code: bit p of the result is
  * `dot(v, planes(p)) >= 0`, MSB-first — the Charikar
  * random-hyperplane hash for cosine LSH, fused into one pass.
  *
  * Like [[NearestCentroids]], the plane matrix enters as ONE nested
  * literal (`typedLit(Seq[Seq[Double]])`) so the generated source is
  * constant-sized regardless of planes×dims — per-plane inline
  * literal arrays (NumPlanes × dim literals in the projection) force
  * Janino to compile a fresh giant expression on every cold run.
  */
case class SignBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any, m: Any): Any =
    SignBucket.compute(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = graft.functions.SignBucket.compute($v, $m);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SignBucket = copy(left = l, right = r)
}

object SignBucket {
  /** Static hot path — called from both eval and generated code. */
  def compute(v: ArrayData, m: ArrayData): Long = {
    val p = m.numElements()
    var code = 0L
    var i = 0
    while (i < p) {
      code = (code << 1) |
        (if (DotProduct.compute(v, m.getArray(i)) >= 0) 1L else 0L)
      i += 1
    }
    code
  }
}

object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge._

  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  def nearest_centroids(v: Column, matrix: Column, nprobe: Int): Column =
    column(NearestCentroids(expression(v), expression(matrix), nprobe))

  def sign_bucket(v: Column, planes: Column): Column =
    column(SignBucket(expression(v), expression(planes)))
}
