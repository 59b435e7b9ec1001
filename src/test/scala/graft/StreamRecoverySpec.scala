package graft

import graft.streaming.EventStream

class StreamRecoverySpec extends SparkTestBase {

  test("sessionize output is micro-batch-count invariant") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val root = graft.util.ScratchIndex.dir(s"sessmb_${sf.hashCode.toHexString}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(root)
    val landing = new java.io.File(root, "landing").toString
    // split the corpus across 6 files; one file per trigger forces a
    // multi-batch drain where users straddle micro-batches
    graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"))
      .repartition(6)
      .write.parquet(landing)
    val src = spark.readStream.schema("user_id LONG, ts LONG")
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val emissions = EventStream.runToCompletion(spark,
      EventStream.sessionizeCore(spark, src), OutputMode.Append()).cache()
    val users = emissions.select("user_id").distinct().count()
    // the hazard is real: Append mode re-emitted users across batches
    assert(emissions.count() > users,
      "expected duplicate per-batch emissions — input drained in one batch")
    // ...and the final-emission reduction recovers the exact batch answer
    val fin = EventStream.sessionizeFinal(emissions)
      .select("user_id", "n_sessions", "max_session_ms")
    val batch = graft.ops.Events.sessionize(spark, sf)
      .select("user_id", "n_sessions", "max_session_ms")
    assert(fin.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(fin).count() === 0)
    emissions.unpersist()
  }

  test("watermark drops late replays; emitted windows equal the batch answer") {
    import org.apache.spark.sql.functions._
    val out = EventStream.lateDataDrop(spark, sf).cache()
    // the oracle-equality form, locally: window counts over the
    // ORIGINAL events only — doubled first-hour buckets would mean
    // the late replays got in
    val batch = graft.util.Tables.events(spark, sf)
      .select(expr("(ts div 1000) div 3600000000").as("bucket"),
        col("event_type"), col("value"))
      .groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
    assert(out.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(out).count() === 0)
    // and the state store really refused rows (the late file wasn't
    // just never delivered)
    assert(EventStream.lateDropCounts.getOrElse(sf, 0L) > 0L,
      s"expected numRowsDroppedByWatermark > 0, got ${EventStream.lateDropCounts.get(sf)}")
    out.unpersist()
  }

  test("transformWithState totals equal the batch per-user aggregate") {
    import org.apache.spark.sql.functions._
    val out = EventStream.twsTotals(spark, sf)
    val batch = graft.util.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
    assert(out.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(out).count() === 0)
    assert(out.count() > 0)
  }

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
    val ckRoot = new java.io.File(EventStream.ckrecRoot(sf), "ck/offsets")
    val batches = ckRoot.listFiles().map(_.getName).filterNot(_.startsWith("."))
    assert(batches.length >= 2,
      s"expected multiple micro-batches across restarts, got ${batches.toSeq}")
  }
}
