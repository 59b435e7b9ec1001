package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues}

/** Instrumentation for [[CountingSessionTimerProcessor]] — static is
  * correct in local mode (driver and executors share the JVM).
  */
object TimerCadenceProbe {
  val fires = new java.util.concurrent.atomic.AtomicLong
  val inputs = new java.util.concurrent.atomic.AtomicLong
  def snap(): (Long, Long) = (fires.get(), inputs.get())
}

/** [[graft.streaming.SessionTimerProcessor]] with per-visit counters:
  * `fires` = handleExpiredTimer invocations (keys visited via the
  * timer registry), `inputs` = handleInputRows invocations (keys
  * visited because a batch carried their rows). Behavior is the
  * production processor's, untouched.
  */
class CountingSessionTimerProcessor
    extends graft.streaming.SessionTimerProcessor {
  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo)
      : Iterator[graft.streaming.SessionClosed] = {
    TimerCadenceProbe.fires.incrementAndGet(): Unit
    super.handleExpiredTimer(key, timerValues, expiredTimerInfo)
  }
  override def handleInputRows(key: Long, rows: Iterator[graft.streaming.Ev],
      timerValues: TimerValues)
      : Iterator[graft.streaming.SessionClosed] = {
    TimerCadenceProbe.inputs.incrementAndGet(): Unit
    super.handleInputRows(key, rows, timerValues)
  }
}

/** MEASURES the production-cadence claim for the event-time-timer
  * shape (NOTES round-10 adjudication; VERDICT r10 "next round" #2):
  * the 5-decade sweep drains the whole corpus in a handful of
  * micro-batches, so each batch's watermark leaps far enough to
  * expire (nearly) EVERY key's timer at once — per-batch cost looks
  * like total keys × batches. A production stream's watermark
  * advances one small step per trigger; the timer registry is an
  * expiry-ordered range scan, so each batch should visit ONLY the
  * keys whose timers expire inside that step.
  *
  * Fixture: K users, one event each (one session per user), close
  * points staggered one minute apart; a single "tick" user then
  * advances the watermark in N equal steps of K/N close points per
  * step, one landing file per step (the StreamCrashSpec one-file-per-
  * trigger shape). Counted per step:
  *   - handleInputRows visits — must be 1 (the tick key), NOT K:
  *     untouched keys are never visited by input;
  *   - handleExpiredTimer visits — must be ~K/N (the keys expiring in
  *     the step, ± the tick user's stale re-fires), NOT K: the
  *     registry scan is bounded by the watermark step;
  *   - closed sessions in the sink — exactly K/N per step.
  * Whole-run total: each user fires exactly once — timer cost is
  * linear in CLOSED sessions, amortized O(1) per key, independent of
  * how many batches the stream runs.
  */
class StreamTimerCadenceSpec extends SparkTestBase {

  private val K = 240          // users with one session each
  private val Steps = 8        // watermark steps → K/Steps closes per step
  private val PerStep = K / Steps
  // 20 s between successive close points: the WHOLE initial span
  // (K·Δ ≈ 80 min) must stay inside gap + watermark-delay (90 min),
  // or landing file 0 already advances the watermark past the early
  // users' close points and the "no fires on load" baseline is lost
  private val DeltaUs = 20L * 1000000L
  private val GapUs = 30L * 60 * 1000000L        // session gap (processor's)
  private val WmDelayUs = 3600L * 1000000L       // watermark delay (query's)
  private val BaseUs = 1000000000000000L         // ~2001-09, µs epoch
  private val TickUser = 1000000L

  test("per-batch timer visits track keys-expiring-in-step, not total keys") {
    val root = graft.util.ScratchIndex.dir("timer_cadence")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(root)
    val landing = new java.io.File(root, "landing"); landing.mkdirs(): Unit

    def land(rows: Seq[(Long, Long)], k: Int): Unit = {
      import spark.implicits._
      val tmp = new java.io.File(root, s"stage_$k")
      rows.toDF("user_id", "ts_us")
        .withColumn("event_time", expr("timestamp_micros(ts_us)"))
        .coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp.toString)
      val pf = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(pf.toPath,
        new java.io.File(landing, f"$k%04d.parquet").toPath): Unit
      rm(tmp)
    }

    // user u's session: one event at BaseUs + u·Δ, due (close point)
    // at +gap; tick j parks max-event-time so the watermark lands
    // half a Δ PAST the PerStep·j-th user's due — steps are exact
    def tickTs(j: Int): Long =
      BaseUs + (PerStep.toLong * j) * DeltaUs - DeltaUs / 2 +
        GapUs + WmDelayUs

    land((0 until K).map(u => (u.toLong, BaseUs + u * DeltaUs)), 0)

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    import spark.implicits._
    val src = spark.readStream
      .schema("user_id LONG, ts_us LONG, event_time TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
    val ds = src.withWatermark("event_time", "1 hour")
      .select(col("user_id"), col("ts_us").as("tsUs"))
      .as[graft.streaming.Ev]
    val out = ds.groupByKey(_.user_id)
      .transformWithState(new CountingSessionTimerProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())

    val f0 = TimerCadenceProbe.fires.get()
    val i0 = TimerCadenceProbe.inputs.get()
    val q = out.toDF().writeStream.outputMode("append")
      .option("checkpointLocation", new java.io.File(root, "ck").toString)
      .format("memory").queryName("timer_cadence").start()
    try {
      def closedCount(): Long =
        spark.sql("SELECT count(*) FROM timer_cadence").as[Long].head()

      q.processAllAvailable()
      val (fAfter0, iAfter0) = TimerCadenceProbe.snap()
      // the loading batch visits every key by INPUT, none by timer
      assert(iAfter0 - i0 === K.toLong)
      assert(fAfter0 - f0 === 0L)
      assert(closedCount() === 0L)

      var prevF = fAfter0
      var prevI = iAfter0
      var prevClosed = 0L
      val perStepFires = Array.newBuilder[Long]
      for (j <- 1 to Steps) {
        land(Seq((TickUser, tickTs(j))), j)
        q.processAllAvailable()
        val (fj, ij) = TimerCadenceProbe.snap()
        val closed = closedCount()
        // input visits: ONLY the tick key — advancing the watermark
        // never touches the other K keys through the input path
        assert(ij - prevI === 1L, s"step $j input visits")
        // closed sessions: exactly the step's share of users (the
        // tick user's session keeps extending and never closes)
        assert(closed - prevClosed === PerStep.toLong, s"step $j closes")
        // timer visits: the expiring keys, ± the tick user's own
        // stale re-fires (≤ 1 per micro-batch; a step runs the data
        // batch plus a no-data watermark batch) — NOT the K total
        // keys with registered or spent timers
        val fires = fj - prevF
        assert(fires >= PerStep.toLong, s"step $j fires=$fires")
        assert(fires <= PerStep.toLong + 4, s"step $j fires=$fires")
        perStepFires += fires
        prevF = fj; prevI = ij; prevClosed = closed
      }
      // whole run: every user visited exactly once by timer (+tick
      // noise) — cost ∝ sessions closed, NOT keys × batches
      assert(prevClosed === K.toLong)
      val totalFires = prevF - fAfter0
      assert(totalFires <= K.toLong + 2L * Steps,
        s"total timer visits $totalFires")
      info(s"per-step timer visits (K=$K, ${Steps} steps): " +
        perStepFires.result().mkString("[", ", ", "]") +
        s", total=$totalFires")
    } finally {
      q.stop()
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None    => spark.conf.unset(provKey)
      }
    }
  }
}
