package graft

import graft.streaming.EventStream

class StreamRecoverySpec extends SparkTestBase {

  test("checkpoint restart delivers every event exactly once") {
    val agg = EventStream.checkpointRecovery(spark, sf).collect()
    assert(agg.nonEmpty)
    // per-group: row count == distinct event_ids (no replay dupes)
    agg.foreach { r =>
      assert(r.getAs[Long]("n") === r.getAs[Long]("n_distinct"),
        s"duplicate events in group ${r.getAs[String]("event_type")}/" +
          s"${r.getAs[String]("vcat")}")
    }
    // global: the sink's committed output covers the whole corpus —
    // nothing lost at the stop, nothing re-read after the restart
    val total = agg.map(_.getAs[Long]("n")).sum
    val expected = spark.read.parquet(s"$sf/events.parquet").count()
    assert(total === expected)
    // and the restart actually split the work: the checkpoint's WAL
    // must record offsets from BOTH query incarnations
    val ckRoot = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_ckrec_${sf.hashCode.toHexString}/ck/offsets")
    val batches = ckRoot.listFiles().map(_.getName).filterNot(_.startsWith("."))
    assert(batches.length >= 2,
      s"expected multiple micro-batches across restarts, got ${batches.toSeq}")
  }
}
