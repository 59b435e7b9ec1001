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
  /** Tokenizer pattern, compiled once per JVM: `String.split("\\s+")`
    * re-compiles the regex on every row (only single-char literals take
    * the fast path), which jstack sampling showed as a material share
    * of the shingle kernel.
    */
  private[functions] val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Static hot path — called from both eval and generated code.
    * Sorts in UTF8String (UTF-8 byte / code-point) order, NOT Java
    * String (UTF-16 code-unit) order — supplementary characters sort
    * differently between the two, and the contract is to mirror both
    * the declarative `sort_array` form and DuckDB's `list_sort`, which
    * compare UTF-8 bytes.
    *
    * Hand-rolled loops (no `sliding`/`mkString`/`distinct`): jstack
    * sampling of the pair-verify hot path showed the Scala collection
    * machinery (ArraySeq slices, ClassTag lookups, mkString's
    * knownSize probes) dominating the kernel. Sort-then-adjacent-dedup
    * replaces the hash `distinct` — identical result on a sorted
    * array. `binaryCompare` replaces `compareTo`, which in Spark 4.1
    * probes `SparkEnvUtils.isTesting` (a synchronized system-property
    * read) on EVERY comparison before delegating to binaryCompare —
    * measured as the top stack frame under contention at 32 threads.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = Whitespace.split(text.toString).filter(_.nonEmpty)
    val m = toks.length
    val raw: Array[UTF8String] =
      if (m >= n) {
        val out = new Array[UTF8String](m - n + 1)
        var i = 0
        while (i < out.length) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        out
      } else {
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < m) {
          if (i > 0) sb.append(' ')
          sb.append(toks(i))
          i += 1
        }
        Array(UTF8String.fromString(sb.toString))
      }
    java.util.Arrays.sort(raw, (a: UTF8String, b: UTF8String) => a.binaryCompare(b))
    var w = 0
    var i = 0
    while (i < raw.length) {
      if (w == 0 || !raw(i).equals(raw(w - 1))) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    val res = if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
    new GenericArrayData(res.asInstanceOf[Array[Any]])
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

/** Per-chunk md5 fingerprints of a text column: tokenize, window into
  * `chunkSize`-token chunks every `stride` tokens, md5 the
  * space-joined tokens of each chunk — the fused form of
  * tokenize → explode(sequence) → slice → concat_ws → md5. The
  * declarative version runs the generator lambda INTERPRETED and
  * re-slices the token array per chunk (cur_para_dedup's measured
  * hot spot); this computes all fingerprints in one pass per row.
  * Semantics mirror the DuckDB oracle: zero-token docs yield the
  * single fingerprint md5('').
  */
case class ChunkFingerprints(child: Expression, chunkSize: Int, stride: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ChunkFingerprints.compute(
      input.asInstanceOf[UTF8String], chunkSize, stride)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkFingerprints" +
        s".compute($c, $chunkSize, $stride);")

  override protected def withNewChildInternal(c: Expression): ChunkFingerprints =
    copy(child = c)
}

object ChunkFingerprints {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static hot path — called from both eval and generated code. */
  def compute(text: UTF8String, chunkSize: Int, stride: Int): ArrayData = {
    val toks = WordShingles.Whitespace.split(text.toString).filter(_.nonEmpty)
    val n = toks.length
    val nChunks = math.max((n + stride - 1) / stride, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](nChunks)
    var i = 0
    while (i < nChunks) {
      val sb = new java.lang.StringBuilder
      val start = i * stride
      val end = math.min(start + chunkSize, n)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(digest(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
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

  def chunk_fingerprints(c: Column, chunkSize: Int, stride: Int): Column =
    column(ChunkFingerprints(expression(c), chunkSize, stride))
}
