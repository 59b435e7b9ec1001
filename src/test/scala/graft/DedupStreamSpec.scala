package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.streaming.DedupStream

class DedupStreamSpec extends SparkTestBase {

  import spark.implicits._

  test("streaming keyed-state dedup finds exactly the batch LSH candidates") {
    // batch candidate set: identical banding, self-join, est >= 0.5
    val docs = graft.util.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val bands = Dedup.bandsOf(Dedup.minhashSignatures(docs))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx")
          && col("x.band_sig") === col("y.band_sig")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sig").as("a_sig"), col("y.sig").as("b_sig"))
      .distinct()
      .as[(Long, Long, Seq[Long], Seq[Long])].collect()
    val expected = cand.flatMap { case (a, b, as_, bs) =>
      val eq = as_.iterator.zip(bs.iterator).count { case (x, y) => x == y }
      if (eq.toDouble / Dedup.NumHashes >= 0.5) Some((a, b)) else None
    }.toSet

    val got = DedupStream.streamingDedup(spark, sf)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

    assert(got === expected,
      s"stream-only: ${got -- expected}; batch-only: ${expected -- got}")
    assert(expected.nonEmpty, "test vacuous: no near-dup pairs at this sf")
  }

  test("stream-maintained LSH index equals the batch-incremental edge relation") {
    val got = DedupStream.streamingLshIndex(spark, sf).collect()
    // the landing really split into micro-batches — otherwise the
    // per-batch mining is vacuously one batch pass
    assert(DedupStream.lastIndexRunBatches.get() >= 2,
      s"only ${DedupStream.lastIndexRunBatches.get()} micro-batch(es)")
    // emitted surface: same relation the batch-incremental path serves
    val batch = Dedup.minhashLshIncremental(spark, sf).collect()
    assert(got.toSeq === batch.toSeq)
    assert(got.nonEmpty, "test vacuous: no J >= 0.7 pairs at this sf")
    // and the FULL streamed edge relation (pre-threshold, incl. both
    // jaccard columns) is the batch delta-edge relation, set-for-set
    val streamedEdges = spark.read.parquet(
      graft.util.ScratchIndex.dir(
        s"lshidx_run_${graft.util.ScratchIndex.corpusTag(sf)}").toString + "/edges")
      .as[(Long, Long, Double, Double)].collect().toSet
    val deltaEdges = Dedup.deltaVerifiedEdges(spark, sf)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(streamedEdges === deltaEdges,
      s"stream-only: ${streamedEdges -- deltaEdges}; " +
        s"batch-only: ${deltaEdges -- streamedEdges}")
  }

  test("stream index run is repeatable (fresh run state, same answer)") {
    // the memoized landing + a stale checkpoint/append dir would
    // double the index or skip every file; two back-to-back runs
    // must agree exactly
    val first = DedupStream.streamingLshIndex(spark, sf).collect()
    val second = DedupStream.streamingLshIndex(spark, sf).collect()
    assert(first.toSeq === second.toSeq)
  }
}
