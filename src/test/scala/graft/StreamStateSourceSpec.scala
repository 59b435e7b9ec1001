package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** The state-data-source query (`stream_state_source`): the driver's
  * DuckDB oracle proves the one-drain answer; this spec proves the
  * properties the oracle can't see —
  *
  *  1. batch-count INVARIANCE: the checkpointed state merged across
  *     ≥4 micro-batches (staged landing, one file per trigger) reads
  *     back identical to the whole-table batch aggregate, i.e. the
  *     state store really accumulated across triggers and the state
  *     read reflects the final committed version;
  *  2. the state-METADATA surface: operator identity and partition
  *     count as persisted in the checkpoint — the contract an
  *     operational inspect/repair tool keys on.
  */
class StreamStateSourceSpec extends SparkTestBase {

  test("state read is batch-count invariant and matches the batch agg") {
    val events = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("value"))
    // stage the corpus as FOUR files; one file per trigger forces a
    // genuinely multi-batch drain (landing is input → memoized)
    val landing = graft.util.ScratchIndex.materializePath(spark,
      s"state_src_landing_${graft.util.ScratchIndex.corpusTag(sf)}") { tmp =>
      events.repartition(4).write.parquet(tmp)
    }
    EventStream.lastStateRunBatches.set(0)
    val src = spark.readStream
      .schema("user_id LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val got = EventStream.stateSourceCore(spark, src).collect()
    assert(EventStream.lastStateRunBatches.get() >= 4,
      s"only ${EventStream.lastStateRunBatches.get()} micro-batch(es) — " +
        "the landing did not split, the invariance test is vacuous")
    val want = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy("user_id").collect()
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("state-metadata exposes the aggregation operator's contract") {
    // run the query path once so a fresh checkpoint exists, then read
    // its metadata surface (ckRoot is per-drain, so rebuild it here)
    val ck = graft.util.ScratchIndex.dir("state_meta_ck")
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
      f.delete(): Unit
    }
    rm(ck)
    import org.apache.spark.sql.streaming.OutputMode
    val agg = EventStream.eventsStream(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .option("checkpointLocation", ck.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.format("noop").mode("overwrite").save()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val meta = spark.read.format("state-metadata").load(ck.toString)
      .collect()
    assert(meta.length === 1)
    val row = meta.head
    assert(row.getAs[String]("operatorName") === "stateStoreSave")
    assert(row.getAs[Int]("numPartitions") === 4)
    assert(row.getAs[Long]("minBatchId") === 0L)
  }
}
