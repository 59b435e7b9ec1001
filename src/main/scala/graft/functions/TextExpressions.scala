package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the near-dup pipeline hot path.
  *
  * Why custom: the declarative formulation
  * (`transform(sequence(0,31), k -> array_min(transform(hashes, h ->
  * pmod(a[k]*h+b[k], p))))`) evaluates HIGHER-ORDER LAMBDAS
  * INTERPRETED, re-evaluating the literal coefficient arrays per
  * element — measured 238 s for 5k docs at sf0.1. These expressions do
  * the same math in one tight JVM loop per row (measured >100×
  * faster).
  *
  * Both expressions implement `doGenCode`: the generated code calls
  * the static `compute` helpers below, so the expression participates
  * in whole-stage codegen without the boxing/virtual-eval seam of
  * CodegenFallback; the per-element hot loop is compiled Scala either
  * way.
  */

/** Sorted distinct word n-gram shingles of a text column — the fused
  * form of tokenize → sliding-window concat → array_distinct →
  * sort_array. Semantics mirror the DuckDB oracle exactly: tokens are
  * maximal non-whitespace runs; texts with fewer than `n` tokens fall
  * back to the single all-tokens join.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  /** Static hot path — called from both eval and generated code.
    * Sorts in UTF8String (UTF-8 byte / code-point) order, NOT Java
    * String (UTF-16 code-unit) order — supplementary characters sort
    * differently between the two, and the contract is to mirror both
    * the declarative `sort_array` form and DuckDB's `list_sort`, which
    * compare UTF-8 bytes.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    val shingles: Array[String] =
      if (toks.length >= n)
        toks.sliding(n).map(_.mkString(" ")).toArray.distinct
      else Array(toks.mkString(" "))
    val utf8 = shingles.map(UTF8String.fromString)
    java.util.Arrays.sort(utf8, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(utf8.asInstanceOf[Array[Any]])
  }
}

/** MinHash signature of a shingle-set column: `numHashes` permutation
  * minima of (a_k * murmur3(shingle) + b_k) mod p, computed in a
  * single pass over the shingles. Coefficients are fixed constants —
  * deterministic across runs, executors and cluster sizes.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($c, $numHashes);")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  /** 2^31 - 1 (Mersenne prime) — permutation modulus. */
  val P: Long = 2147483647L
  val HashSeedA: Long = 2654435761L // Knuth multiplicative constant
  val HashSeedB: Long = 40503L

  /** Static hot path — called from both eval and generated code. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      as(k) = HashSeedA * (k + 1) % P
      bs(k) = HashSeedB * (k + 1) * (k + 1) % P
      k += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      val hl = ((h.toLong % P) + P) % P
      k = 0
      while (k < numHashes) {
        val v = (as(k) * hl + bs(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Column-level API for the custom expressions (Spark 4's classic
  * Column↔Expression bridge).
  */
object TextFunctions {
  import org.apache.spark.sql.GraftColumnBridge._

  def word_shingles(c: Column, n: Int = 3): Column =
    column(WordShingles(expression(c), n))

  def minhash_signature(c: Column, numHashes: Int = 32): Column =
    column(MinHashSignature(expression(c), numHashes))
}
