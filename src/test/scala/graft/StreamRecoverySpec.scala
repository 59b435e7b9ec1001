package graft

import graft.streaming.EventStream

class StreamRecoverySpec extends SparkTestBase {

  test("sessionize output is micro-batch-count invariant") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val root = graft.util.ScratchIndex.dir(s"sessmb_${graft.util.ScratchIndex.corpusTag(sf)}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(root)
    val landing = new java.io.File(root, "landing").toString
    // split the corpus across 6 files; one file per trigger forces a
    // multi-batch drain where users straddle micro-batches
    graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"))
      .repartition(6)
      .write.parquet(landing)
    val src = spark.readStream.schema("user_id LONG, ts_us LONG")
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
      .select(expr("ts_us div 3600000000").as("bucket"),
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

  test("tws event-time timers close exactly the watermark-passed sessions") {
    import org.apache.spark.sql.functions._
    val out = EventStream.twsSessionTimers(spark, sf)
    // closed-session oracle, engine-local: sessions whose end+gap the
    // final watermark (floor-ms of max ts, minus 1h) passed
    canonView(sf)
    val batch = spark.sql(localOracleSql())
    assert(out.count() > 0, "no sessions closed — timer path never fired")
    assert(out.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(out).count() === 0)
    // non-vacuity the other way: some sessions must remain OPEN (the
    // last hour+gap of every user's timeline), or the query degrades
    // to plain sessionize and the timer semantics are untested
    val allSessions = spark.sql(localOracleSql(closedOnly = false))
    assert(batch.agg(sum("n_closed_sessions")).head.getLong(0) <
      allSessions.agg(sum("n_closed_sessions")).head.getLong(0),
      "every session closed — watermark boundary untested")
  }

  test("tws timer emissions are micro-batch-count invariant") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val root = graft.util.ScratchIndex.dir(s"twsmb_${graft.util.ScratchIndex.corpusTag(sf)}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(root)
    val landing = new java.io.File(root, "landing")
    landing.mkdirs(): Unit
    // time-RANGE split (not random): each file covers a disjoint ts
    // band and lands with increasing mod time, so the per-file replay
    // is in event-time order and nothing is ever late under the 1-h
    // watermark — the timers, not late-row filtering, decide emission
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"))
    val bounds =
      ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = hi - lo + 1
    for (k <- 0 until 6) {
      val part = ev.filter(col("ts_us") >= lo + k * span / 6 &&
        col("ts_us") < lo + (k + 1) * span / 6 + (if (k == 5) 1 else 0))
      val tmp = new java.io.File(root, s"stage_$k")
      part.coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp.toString)
      val pf = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(landing, f"$k%04d.parquet")
      java.nio.file.Files.move(pf.toPath, dst.toPath): Unit
      dst.setLastModified(1600000000000L + k * 60000L): Unit
      rm(tmp)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try {
      val src = spark.readStream.schema("user_id LONG, ts_us LONG")
        .option("maxFilesPerTrigger", "1").parquet(landing.toString)
        .withColumn("event_time", timestamp_micros(col("ts_us")))
      val replay = EventStream.twsSessionTimersCore(spark, src)
      val oneShot = EventStream.twsSessionTimers(spark, sf)
      assert(replay.exceptAll(oneShot).count() === 0)
      assert(oneShot.exceptAll(replay).count() === 0)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("session close at the == gap watermark boundary stays open (strict)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The tie the r7 ADVICE flagged: an event exactly `gap` after the
    // previous one is the SAME session (split rule is strict >), so a
    // session may only close once the watermark STRICTLY passes
    // end+gap — at equality a joinable on-time row (ts == end+gap)
    // could still arrive. User 1: two events exactly 30 min apart
    // (end = a1); user 2 supplies the max event that positions the
    // final watermark (max − 1 h) EXACTLY at end+gap, then 1 ms past.
    val base = 1704067200L * 1000000L // 2024-01-01 UTC, µs
    val gapUs = 30L * 60 * 1000000L
    val hourUs = 3600L * 1000000L
    def closedAt(tB: Long, tag: String) = {
      val root = graft.util.ScratchIndex.dir(s"tie_$tag")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(root)
      root.mkdirs(): Unit
      Seq((1L, base), (1L, base + gapUs), (2L, tB))
        .toDF("user_id", "ts_us")
        .coalesce(1).write.parquet(new java.io.File(root, "in").toString)
      val src = spark.readStream.schema("user_id LONG, ts_us LONG")
        .parquet(new java.io.File(root, "in").toString)
        .withColumn("event_time", timestamp_micros(col("ts_us")))
      EventStream.twsSessionTimersCore(spark, src)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try {
      // user-1 session end = base+gap, so its close point end+gap =
      // base+2·gap; tB positions the final watermark (max ts − 1 h)
      // exactly ON that point, then 1 ms past it
      val atBoundary = closedAt(base + 2 * gapUs + hourUs, "eq")
      assert(atBoundary.count() === 0,
        "session closed at wm == end+gap — close must be STRICT")
      // 1 ms past the boundary → the session closes, with exact stats
      val past = closedAt(base + 2 * gapUs + hourUs + 1000L, "gt").collect()
      assert(past.length === 1)
      val r = past(0)
      assert(r.getAs[Long]("user_id") === 1L &&
        r.getAs[Long]("n_closed_sessions") === 1L &&
        r.getAs[Long]("n_closed_events") === 2L &&
        r.getAs[Long]("max_session_ms") === gapUs / 1000)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Registers the canonical normalized events as the view the
    * Spark-SQL oracle twins select from (they must see the same
    * `ts_us` basis as the engine, whatever the driver's `ts` type). */
  private def canonView(dir: String): Unit =
    graft.util.Tables.events(spark, dir)
      .createOrReplaceTempView("events_canon")

  /** Spark-SQL twin of the DuckDB oracle (µs basis, floor-ms
    * watermark); closedOnly=false drops the watermark filter.
    */
  private def localOracleSql(closedOnly: Boolean = true): String = {
    val filter = if (closedOnly) "WHERE e + 1800000000 < wm_us" else ""
    s"""WITH ev AS (
       |  SELECT user_id, ts_us FROM events_canon
       |), wm AS (
       |  SELECT ((max(ts_us) div 1000) - 3600000) * 1000 AS wm_us FROM ev
       |), marked AS (
       |  SELECT user_id, ts_us,
       |         CASE WHEN lag(ts_us) OVER w IS NULL
       |                OR ts_us - lag(ts_us) OVER w > 1800000000
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
       |), sess AS (
       |  SELECT user_id, ts_us,
       |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM marked
       |), per_session AS (
       |  SELECT user_id, sid, min(ts_us) AS s, max(ts_us) AS e,
       |         count(*) AS n
       |  FROM sess GROUP BY 1, 2
       |)
       |SELECT user_id, count(*) AS n_closed_sessions,
       |       sum(n) AS n_closed_events,
       |       max((e - s) div 1000) AS max_session_ms
       |FROM per_session, wm
       |$filter
       |GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  test("tws MapState per-type totals equal the batch two-key aggregate") {
    import org.apache.spark.sql.functions._
    val out = EventStream.twsMapTotals(spark, sf)
    val batch = graft.util.Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
    assert(out.count() > 0)
    assert(out.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(out).count() === 0)
    // the map cell really is composite: users carry multiple types
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() > 0)
  }

  test("tws initial-state bootstrap: seed + stream equals full rebuild") {
    import org.apache.spark.sql.functions._
    val out = EventStream.twsBootstrap(spark, sf).cache()
    val ev = graft.util.Tables.events(spark, sf)
    // live-driven oracle: all-events totals for users with >=1 odd
    // event, plus the even-half count that must have come via the
    // initial-state path
    val batch = ev.filter(col("event_id") % 2 === 1)
      .select("user_id").distinct()
      .join(ev, "user_id")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_seed_events"))
    assert(out.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(out).count() === 0)
    // non-vacuous: state really was seeded (not all users start cold)
    assert(out.filter(col("n_seed_events") > 0).count() > 0,
      "no user received initial state — the bootstrap path never ran")
    out.unpersist()
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
