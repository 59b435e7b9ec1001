package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Failure-injection helpers — a top-level object so the closure
  * serializes by reference and the counters are JVM-static (local
  * mode: executor threads share them with the test).
  */
object CrashInject {
  /** Times the task-failure path actually threw. */
  val taskThrows = new AtomicInteger(0)

  /** Remaining query-crash throws; >0 means the marker row kills its
    * task on EVERY attempt (exhausting the 2-attempt budget → the job,
    * and with it the streaming query, dies mid-batch).
    */
  val queryCrashesLeft = new AtomicInteger(0)

  def taskFail(eventId: Long, marker: Long): Long = {
    val tc = org.apache.spark.TaskContext.get()
    if (eventId == marker && tc != null && tc.attemptNumber() == 0) {
      taskThrows.incrementAndGet()
      throw new RuntimeException(s"injected failure: first attempt at $marker")
    }
    eventId
  }

  def queryCrash(eventId: Long, marker: Long): Long = {
    if (eventId == marker && queryCrashesLeft.getAndDecrement() > 0)
      throw new RuntimeException(s"injected mid-batch crash at $marker")
    queryCrashesLeft.compareAndSet(-1, 0): Unit // don't underflow
    eventId
  }
}

/** Crash-consistency for the streaming exactly-once contract
  * (VERDICT r7 #5): `stream_ckpt_recovery` proves recovery across a
  * GRACEFUL stop; these tests prove the committed parquet sink stays
  * exactly-once when a batch actually FAILS mid-write —
  *
  *  - task retry: a marker row throws on its task's first attempt;
  *    the retried attempt succeeds inside the same batch, and the
  *    commit protocol discards the dead attempt's partial file;
  *  - mid-batch query death + restart: the marker row throws on every
  *    attempt until the task budget is exhausted, the query dies; the
  *    sink's committed view must contain EXACTLY the batches that
  *    committed before the crash (no partial batch-2 rows), and a
  *    restart from the same checkpoint must converge to the oracle.
  */
class StreamCrashSpec extends SparkTestBase {

  test("task retry inside a batch keeps the parquet sink exactly-once") {
    val (landing, out, ck, marker) = stage("taskretry")
    CrashInject.taskThrows.set(0)
    val fail = udf(CrashInject.taskFail _)
    val q = stream(landing)
      .withColumn("event_id", fail(col("event_id"), lit(marker)))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    assert(CrashInject.taskThrows.get() >= 1,
      "injection never fired — the retry path is untested")
    assertMatchesOracle(out, landing)
  }

  test("mid-batch query death commits nothing partial; restart converges") {
    val (landing, out, ck, marker) = stage("querycrash")
    // marker kills both task attempts → batch 2's job fails → query dies
    CrashInject.queryCrashesLeft.set(2)
    val crash = udf(CrashInject.queryCrash _)
    def runOnce(): Option[Throwable] = {
      val q = stream(landing)
        .withColumn("event_id", crash(col("event_id"), lit(marker)))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      try { q.processAllAvailable(); None }
      catch { case e: Throwable => Some(e) }
      finally q.stop()
    }
    val crashErr = runOnce()
    assert(crashErr.isDefined, "query survived — the crash never happened")
    assert(CrashInject.queryCrashesLeft.get() === 0,
      "task budget not exhausted — query died for another reason")
    // committed view mid-crash: exactly the pre-crash batch (file 1 =
    // even half), zero rows from the aborted batch
    val committed = spark.read.parquet(out)
    val evenHalf = spark.read.parquet(landing)
      .filter(pmod(col("event_id"), lit(2)) === 0)
    assert(committed.count() === evenHalf.count(),
      "committed sink is not exactly the pre-crash batch")
    assert(committed.select("event_id").exceptAll(
      evenHalf.select("event_id")).count() === 0,
      "aborted batch leaked rows into the committed view")
    // restart from the same checkpoint: batch 2 re-executes cleanly
    val retryErr = runOnce()
    assert(retryErr.isEmpty, s"restart failed: $retryErr")
    assertMatchesOracle(out, landing)
  }

  /** Lands the sf events table as two files — file 0 the even
    * event_ids, file 1 the odd — and returns (landing, out, ck,
    * marker) where marker is an odd event_id (so it strikes in the
    * SECOND batch, after batch 1 already committed).
    */
  private def stage(tag: String): (String, String, String, Long) = {
    val root = graft.util.ScratchIndex.dir(s"crash_${tag}_" +
      graft.util.ScratchIndex.corpusTag(sf))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(root)
    val landing = new java.io.File(root, "landing")
    landing.mkdirs(): Unit
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    def land(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
      val tmp = new java.io.File(root, s"stage_$k")
      df.coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp.toString)
      val pf = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(landing, f"$k%04d.parquet")
      java.nio.file.Files.move(pf.toPath, dst.toPath): Unit
      dst.setLastModified(1600000000000L + k * 60000L): Unit
      rm(tmp)
    }
    land(ev.filter(pmod(col("event_id"), lit(2)) === 0), 0)
    land(ev.filter(pmod(col("event_id"), lit(2)) === 1), 1)
    val marker = ev.filter(pmod(col("event_id"), lit(2)) === 1)
      .agg(min(col("event_id"))).head().getLong(0)
    (landing.toString, new java.io.File(root, "out").toString,
      new java.io.File(root, "ck").toString, marker)
  }

  private def stream(landing: String): org.apache.spark.sql.DataFrame =
    spark.readStream
      .schema("event_id LONG, user_id LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)

  /** The committed sink (via _spark_metadata) must equal the plain
    * batch aggregate of everything landed — same rows, no dups, none
    * missing.
    */
  private def assertMatchesOracle(out: String, landing: String): Unit = {
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("event_id")).as("n_distinct"),
          round(sum(col("value")), 4).as("sum_value"))
    val got = agg(spark.read.parquet(out))
    val want = agg(spark.read.parquet(landing))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }
}
