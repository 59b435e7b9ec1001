package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** State-TTL coverage (VERDICT r7 #4), both implementations:
  *
  *  - the ORACLED event-time TTL cell ([[graft.streaming.TtlCellProcessor]]):
  *    eviction is a deterministic function of the event timestamps, so
  *    the query compares exactly against a gap-run SQL oracle, one-shot
  *    and across a staged multi-batch replay;
  *  - the BUILT-IN processing-time `TTLConfig` path
  *    ([[graft.streaming.TtlTotalsProcessor]]): clock-driven and
  *    unoracleable, and the query is never idle (the engine schedules
  *    empty expiry micro-batches forever), so the test drives it by
  *    polling the sink and stopping explicitly — never
  *    processAllAvailable.
  */
class StreamTtlSpec extends SparkTestBase {

  private val TtlUs = 1200000000L // 20 min, must match TtlCellProcessor

  test("tws ttl evictions equal the gap-run oracle; both expiry paths fire") {
    val out = EventStream.twsTtlEvictions(spark, sf)
    canonView(sf)
    val batch = spark.sql(localOracleSql())
    assert(out.count() > 0, "no evictions — TTL never expired a cell")
    assert(out.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(out).count() === 0)
    // non-vacuity three ways, via the oracle's run structure:
    val runs = spark.sql(runStatsSql()).head()
    val (lazyRuns, timerOnly, openCells) =
      (runs.getLong(0), runs.getLong(1), runs.getLong(2))
    assert(lazyRuns > 0, "no run followed by a later run — " +
      "lazy expiry-on-write untested")
    assert(timerOnly > 0, "no final run expired by watermark — " +
      "timer expiry untested")
    assert(openCells > 0, "every cell expired — live-state retention " +
      "(the no-early-eviction direction) untested")
  }

  test("tws ttl evictions are micro-batch-count invariant") {
    import org.apache.spark.sql.streaming.OutputMode
    val root = graft.util.ScratchIndex.dir(s"ttlmb_${graft.util.ScratchIndex.corpusTag(sf)}")
    rm(root)
    val landing = new java.io.File(root, "landing")
    landing.mkdirs(): Unit
    // time-RANGE split with increasing mod times: replay is in event-
    // time order, nothing is late under the 1-h watermark, and cells
    // written in one micro-batch are renewed/expired in later ones
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("value"))
    val bounds =
      ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = hi - lo + 1
    for (k <- 0 until 6) {
      val part = ev.filter(col("ts_us") >= lo + k * span / 6 &&
        col("ts_us") < lo + (k + 1) * span / 6 + (if (k == 5) 1 else 0))
      land(part, root, landing, k)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.schema("user_id LONG, ts_us LONG, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
        .withColumn("event_time", timestamp_micros(col("ts_us")))
      val replay = EventStream.twsTtlEvictionsCore(spark, src)
      val oneShot = EventStream.twsTtlEvictions(spark, sf)
      assert(replay.exceptAll(oneShot).count() === 0)
      assert(oneShot.exceptAll(replay).count() === 0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("built-in TTLConfig expires state between micro-batches") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    val root = graft.util.ScratchIndex.dir(s"ttlpt_${graft.util.ScratchIndex.corpusTag(sf)}")
    rm(root)
    val landing = new java.io.File(root, "landing")
    landing.mkdirs(): Unit
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val halfA = ev.filter(col("event_id") % 2 === 0)
    val halfB = ev.filter(col("event_id") % 2 === 1)
    val usersA = halfA.select("user_id").distinct().count()
    val usersB = halfB.select("user_id").distinct().count()
    land(halfA.drop("event_id"), root, landing, 0)
    val name = s"ttlpt_sink_${graft.util.ScratchIndex.corpusTag(sf)}"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.schema("user_id LONG, value DOUBLE")
        .parquet(landing.toString).as[graft.streaming.EvVal]
      val out = src.groupByKey(_.user_id)
        .transformWithState(new graft.streaming.TtlTotalsProcessor,
          TimeMode.ProcessingTime(), OutputMode.Append())
      val q = out.toDF().writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation",
          graft.util.ScratchIndex.dir(s"ck_$name").toString)
        .format("memory").queryName(name).start()
      try {
        awaitRows(name, usersA)
        // let wall-clock advance far past the 1 ms TTL before the next
        // batch's data exists, so batch B must read expired state
        Thread.sleep(1500)
        land(halfB.drop("event_id"), root, landing, 1)
        awaitRows(name, usersA + usersB)
      } finally q.stop()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
    // if TTL failed to evict, half-B emissions would be cumulative
    // (A+B totals) and the per-half multiset equality would break
    val got = spark.table(name)
      .select(col("user_id"), col("n_events"),
        round(col("sum_value"), 4).as("sum_value"))
    def halfTotals(half: org.apache.spark.sql.DataFrame) =
      half.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"))
    val want = halfTotals(halfA).unionAll(halfTotals(halfB))
    assert(got.count() === usersA + usersB)
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  /** Poll the memory sink until it holds `n` rows. The TTL'd query
    * never goes idle, so polling+stop is the only safe drain.
    */
  private def awaitRows(sink: String, n: Long): Unit = {
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (spark.table(sink).count() < n) {
      assert(System.nanoTime() < deadline,
        s"sink $sink stuck below $n rows after 120 s")
      Thread.sleep(100)
    }
    assert(spark.table(sink).count() === n)
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(): Unit
  }

  /** Land `df` as one parquet file with a deterministic increasing
    * mod time, so FileStreamSource replays files in landing order.
    */
  private def land(df: org.apache.spark.sql.DataFrame, root: java.io.File,
      landing: java.io.File, k: Int): Unit = {
    val tmp = new java.io.File(root, s"stage_$k")
    df.coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp.toString)
    val pf = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(landing, f"$k%04d.parquet")
    java.nio.file.Files.move(pf.toPath, dst.toPath): Unit
    dst.setLastModified(1600000000000L + k * 60000L): Unit
    rm(tmp)
  }

  /** Registers the canonical normalized events as the view the
    * Spark-SQL oracle twins select from (they must see the same
    * `ts_us` basis as the engine, whatever the driver's `ts` type). */
  private def canonView(dir: String): Unit =
    graft.util.Tables.events(spark, dir)
      .createOrReplaceTempView("events_canon")

  /** Spark-SQL twin of the DuckDB oracle (µs basis, floor-ms
    * watermark, strict expiry).
    */
  private def localOracleSql(): String =
    s"""WITH ev AS (
       |  SELECT user_id, ts_us, value FROM events_canon
       |), wm AS (
       |  SELECT ((max(ts_us) div 1000) - 3600000) * 1000 AS wm_us FROM ev
       |), marked AS (
       |  SELECT user_id, ts_us, value,
       |         CASE WHEN lag(ts_us) OVER w IS NULL
       |                OR ts_us - lag(ts_us) OVER w > $TtlUs
       |              THEN 1 ELSE 0 END AS new_run
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
       |), runs AS (
       |  SELECT user_id, ts_us, value,
       |         sum(new_run) OVER (PARTITION BY user_id ORDER BY ts_us
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
       |  FROM marked
       |), per_run AS (
       |  SELECT user_id, rid, count(*) AS n, sum(value) AS sv,
       |         max(ts_us) AS e
       |  FROM runs GROUP BY 1, 2
       |), flagged AS (
       |  SELECT user_id, rid, n, sv, e,
       |         max(rid) OVER (PARTITION BY user_id) AS max_rid
       |  FROM per_run
       |)
       |SELECT user_id, count(*) AS n_evictions,
       |       sum(n) AS evicted_events,
       |       round(sum(sv), 4) AS evicted_sum,
       |       max(e + $TtlUs) AS last_expire_us
       |FROM flagged, wm
       |WHERE rid < max_rid OR e + $TtlUs < wm_us
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** (runs with a later run, final runs expired only by the timer,
    * final runs still live at stream end) — the three structural
    * counts behind the non-vacuity assertions.
    */
  private def runStatsSql(): String =
    s"""WITH ev AS (
       |  SELECT user_id, ts_us FROM events_canon
       |), wm AS (
       |  SELECT ((max(ts_us) div 1000) - 3600000) * 1000 AS wm_us FROM ev
       |), marked AS (
       |  SELECT user_id, ts_us,
       |         CASE WHEN lag(ts_us) OVER w IS NULL
       |                OR ts_us - lag(ts_us) OVER w > $TtlUs
       |              THEN 1 ELSE 0 END AS new_run
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
       |), runs AS (
       |  SELECT user_id, ts_us,
       |         sum(new_run) OVER (PARTITION BY user_id ORDER BY ts_us
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rid
       |  FROM marked
       |), per_run AS (
       |  SELECT user_id, rid, max(ts_us) AS e
       |  FROM runs GROUP BY 1, 2
       |), flagged AS (
       |  SELECT user_id, rid, e,
       |         max(rid) OVER (PARTITION BY user_id) AS max_rid
       |  FROM per_run
       |)
       |SELECT sum(CASE WHEN rid < max_rid THEN 1 ELSE 0 END) AS lazy_runs,
       |       sum(CASE WHEN rid = max_rid AND e + $TtlUs < wm_us
       |                THEN 1 ELSE 0 END) AS timer_only,
       |       sum(CASE WHEN rid = max_rid AND e + $TtlUs >= wm_us
       |                THEN 1 ELSE 0 END) AS open_cells
       |FROM flagged, wm""".stripMargin
}
