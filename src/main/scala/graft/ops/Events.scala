package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables._

/** Event-stream analytics over the `events` table in the canonical
  * event-time schema (`ts_us` BIGINT epoch-µs + `event_time`
  * TIMESTAMP — Tables.events normalizes whatever `ts` encoding the
  * driver generator wrote). Batch forms here; the Structured
  * Streaming surface over the same shapes lives in graft.streaming.
  *
  * All timestamp arithmetic is integer (BIGINT) on a microsecond
  * basis.
  */
object Events {

  // All event-time arithmetic runs on a MICROSECOND basis: Spark's
  // canonical `ts_us` == DuckDB's `epoch_us(ts)` for every driver
  // `ts` encoding (epoch_us truncates TIMESTAMP_NS to µs, and is
  // exact on µs-precision TIMESTAMP), so buckets/gaps derive from
  // the same integers in both engines.
  private val HourUs = 3600L * 1000 * 1000
  private val SessionGapUs = 30L * 60 * 1000 * 1000 // 30 min

  /** Tumbling 1-hour window aggregation by event type: the batch
    * equivalent of `groupBy(window($"event_time", "1 hour"), $"event_type")`.
    * Integer-division bucketing → plain grouped agg, partial combine,
    * one shuffle on (bucket, event_type).
    */
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("bucket", expr(s"ts_us div ${HourUs}L"))
      .groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("bucket", "event_type")

  val tumblingWindowSql: String =
    """SELECT epoch_us(ts) // 3600000000 AS bucket, event_type,
      |       count(*) AS n_events,
      |       round(sum(value), 4) AS sum_value,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  /** Sessionization: per-user sessions split on >30-min gaps (classic
    * lag + cumulative-sum-of-boundaries), then per-user session stats.
    * Window partitioned by user_id — state is distributed per key, the
    * streaming-compatible formulation (cf. flatMapGroupsWithState in
    * graft.streaming).
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    events(s, d)
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || col("ts_us") - col("prev_ts") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        // integer division in BOTH engines (Spark `div`, DuckDB `//`):
        // float-division-then-cast truncates in Spark but rounds in DuckDB
        expr("(max(ts_us) - min(ts_us)) div 1000").as("duration_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        max(col("duration_ms")).as("max_session_ms"))
      .orderBy("user_id")
  }

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, epoch_us(ts) AS tsn,
      |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
      |), sess AS (
      |  SELECT user_id, tsn,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY tsn
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked
      |), per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |         (max(tsn) - min(tsn)) // 1000 AS duration_ms
      |  FROM sess GROUP BY 1, 2
      |)
      |SELECT user_id, count(*) AS n_sessions,
      |       max(n_events) AS max_session_events,
      |       max(duration_ms) AS max_session_ms
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Top event value per user per type — dedup/top-1 pattern over a
    * keyed stream (keep the highest-value event; ties → lowest id).
    *
    * Implemented as ONE hash aggregate with `max_by` over a
    * lexicographic (value, -event_id) ordering struct — partial
    * combine runs map-side, nothing is ever sorted. The equivalent
    * window row_number() formulation (kept in topEventPerUserWindow
    * for the spec) shuffles AND sorts every event per key: at 100 TB
    * the max_by plan moves one row per (user,type) per map task, the
    * window plan moves and sorts them all.
    */
  def topEventPerUser(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        max_by(col("event_id"),
          struct(col("value"), (-col("event_id")).as("neg_id")))
          .as("event_id"),
        round(max(col("value")), 4).as("value"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"))
      .orderBy("user_id", "event_type")

  /** Window-function formulation of the same query (the general
    * grouped top-K shape for K > 1); spec asserts equality with the
    * max_by plan.
    */
  def topEventPerUserWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(desc("value"), asc("event_id"))
    events(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        round(col("value"), 4).as("value"))
      .orderBy("user_id", "event_type")
  }

  val topEventPerUserSql: String =
    """SELECT user_id, event_type, event_id, round(value, 4) AS value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |         row_number() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY value DESC, event_id) AS rk
      |  FROM events
      |) WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin

  /** AS-OF join — an operator Spark lacks natively (DuckDB has `ASOF
    * JOIN`; pandas has merge_asof). For each purchase event, attach
    * the user's most recent view event at-or-before it.
    *
    * Spark-first composition instead of a custom SparkPlan: tag-union
    * both sides, then `last(view_ts, ignoreNulls) OVER (PARTITION BY
    * user ORDER BY ts, side)` — views sort before purchases on ts
    * ties, giving exact `>=` as-of semantics. ONE shuffle on user_id
    * (same as any keyed window), no range self-join blowup; at 100 TB
    * this is the plan a purpose-built AsOfJoinExec would produce
    * (co-partition by key, per-partition ordered sweep).
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val tagged = ev
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"),
        when(col("event_type") === "view", col("ts_us")).as("view_ts"),
        when(col("event_type") === "view", 0).otherwise(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase"
        && col("last_view_ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        expr("(ts_us - last_view_ts) div 1000").as("gap_ms"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """SELECT p.event_id, p.user_id,
      |       (epoch_us(p.ts) - epoch_us(v.ts)) // 1000 AS gap_ms
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY p.event_id""".stripMargin

  /** Native session windows (`session_window`, Spark 3.2+): the
    * built-in form of the lag/cumsum sessionization above — merges
    * events closer than the gap into one window, batch or streaming.
    * Output matches the hand-rolled form (same oracle SQL shape).
    */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
      .orderBy("user_id")

  val sessionWindowSql: String =
    """WITH marked AS (
      |  SELECT user_id, epoch_us(ts) AS tsn,
      |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
      |), sess AS (
      |  SELECT user_id, tsn,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY tsn
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked
      |), per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM sess GROUP BY 1, 2
      |)
      |SELECT user_id, count(*) AS n_sessions,
      |       max(n_events) AS max_session_events
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sliding windows (1 h window, 15 min slide) in batch form: each
    * event explodes into window/slide = 4 buckets — the same
    * assignment Spark's `window(t, "1 hour", "15 minutes")` performs.
    * One narrow explode + grouped agg; oracle replays the explosion
    * with unnest.
    */
  def slidingWindow(s: SparkSession, d: String): DataFrame = {
    val slideUs = 900L * 1000 * 1000
    events(s, d)
      .withColumn("tus", col("ts_us"))
      .select(col("event_type"), col("value"), col("tus"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("win_start",
        (expr(s"tus div ${slideUs}L") - col("k")) * slideUs)
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy("win_start", "event_type")
  }

  val slidingWindowSql: String =
    """SELECT (epoch_us(ts) // 900000000 - k) * 900000000 AS win_start,
      |       event_type,
      |       count(*) AS n_events,
      |       round(sum(value), 4) AS sum_value
      |FROM events, unnest([0, 1, 2, 3]) AS t(k)
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Pivot (grouped cross-tab): event counts per user × type as
    * columns — groupBy().pivot() with an explicit column list (never
    * the two-pass value-discovery form at scale).
    */
  def pivotCounts(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val pivotCountsSql: String =
    """SELECT user_id,
      |       count(*) FILTER (WHERE event_type = 'click')    AS click,
      |       count(*) FILTER (WHERE event_type = 'error')    AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |       count(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Grouped top-K (K=3) via the custom TypedImperativeAggregate
    * (graft.functions.TopKByValue): one hash aggregate with a bounded
    * K-heap buffer per group — no per-group sort, map-side combine
    * contributes ≤K rows per group to the shuffle. Oracle replays it
    * with the window row_number formulation.
    */
  def topKCustomAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(graft.functions.TopKByValue.top_k_by_value(
        struct(col("value").cast("double"), col("event_id").cast("long")),
        3).as("ids"))
      .select(col("user_id"), posexplode(col("ids")))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col").as("event_id"))
      .orderBy("user_id", "rank")

  val topKCustomAggSql: String =
    """SELECT user_id, rk AS rank, event_id FROM (
      |  SELECT user_id, event_id,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY value DESC, event_id) AS rk
      |  FROM events
      |) WHERE rk <= 3 ORDER BY user_id, rank""".stripMargin

  /** Conversion funnel: view → click → purchase in STRICT event-time
    * order per user (each stage's first occurrence must be at or
    * after the previous stage's). Three keyed aggregates chained by
    * co-partitioned joins on user_id — at scale every step shuffles
    * on the same key, so AQE reuses the partitioning; no windows, no
    * global state.
    *
    * ONE plan, zero driver-side actions: the stage relations are
    * LEFT-joined v→c→p on user_id and all three stage counts plus
    * the latency summary come out of a single aggregate — count(tv)
    * counts every v row, count(tc)/count(tp) count only matched
    * stages. The previous form ran v.count() and c.count() as
    * separate jobs with nothing persisted, re-executing the events
    * scan + view aggregation up to 6× across 3 jobs; in the single
    * plan Catalyst's ReuseExchange dedupes the identical v/c shuffle
    * subtrees so each stage aggregate materializes once.
    *
    * Latency stays integer-µs end to end: exact BIGINT sum (null
    * tp−tv rows are skipped by sum, matching the old p-only scan),
    * ONE shared division — both engines compute bit-identical
    * doubles (element-wise /1000.0 before summing would accumulate
    * engine-order-dependent error; no round: the true k/(1000n)
    * ratio CAN land on a real decimal tie, taxonomy case 2).
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"), col("ts_us").as("tsu"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tsu")).as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("tsu") >= col("tv"))
      .groupBy(col("user_id"))
      .agg(min(col("tsu")).as("tc"), first(col("tv")).as("tv"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("tsu") >= col("tc"))
      .groupBy(col("user_id"))
      .agg(min(col("tsu")).as("tp"))
    v.join(c.select(col("user_id"), col("tc")), Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .agg(count(col("tv")).as("n_view"),
        count(col("tc")).as("n_click"),
        count(col("tp")).as("n_purchase"),
        (sum(col("tp") - col("tv")) / (lit(1000.0) * count(col("tp"))))
          .as("avg_view_to_purchase_ms"))
  }

  val funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events
      |), v AS (
      |  SELECT user_id, min(tsu) AS tv FROM e
      |  WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(tsu) AS tc, any_value(tv) AS tv
      |  FROM e JOIN v ON e.user_id = v.user_id
      |  WHERE event_type = 'click' AND tsu >= tv GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(tsu) AS tp, any_value(tv) AS tv
      |  FROM e JOIN c ON e.user_id = c.user_id
      |  WHERE event_type = 'purchase' AND tsu >= tc GROUP BY e.user_id
      |)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_click,
      |       count(*) AS n_purchase,
      |       sum(tp - tv) / (1000.0 * count(*)) AS avg_view_to_purchase_ms
      |FROM p""".stripMargin

  /** Cohort retention: users cohorted by first-active day, retention
    * = distinct users from the cohort active again k days later.
    * Two keyed aggregates + one self-join on user_id (co-partitioned
    * with the cohort assignment); all day arithmetic is integer so
    * both engines agree exactly. The standard product-analytics
    * matrix, bounded to offsets 0-7 for a stable oracle.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val DayUs = 86400L * 1000000L
    val ev = events(s, d)
      .select(col("user_id"), expr(s"ts_us div ${DayUs}L").as("day"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val active = ev.select(col("user_id"), col("day")).distinct()
    active.join(firstDay, Seq("user_id"))
      .withColumn("offset", col("day") - col("cohort"))
      .filter(col("offset").between(0, 7))
      .groupBy(col("cohort"), col("offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort", "offset")
  }

  val cohortRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), fd AS (
      |  SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id
      |), act AS (
      |  SELECT DISTINCT user_id, day FROM ev
      |)
      |SELECT cohort, day - cohort AS "offset",
      |       count(DISTINCT act.user_id) AS n_active
      |FROM act JOIN fd ON act.user_id = fd.user_id
      |WHERE day - cohort BETWEEN 0 AND 7
      |GROUP BY 1, 2 ORDER BY cohort, "offset"""".stripMargin

  /** Z-score anomaly detection: per-type mean/stddev from one grouped
    * pass, broadcast back, rows beyond 3σ flagged — the standard
    * streaming-friendly outlier gate (the stats job is tiny; the flag
    * pass is narrow). Population stddev (n divisor) on identical data
    * in both engines; count + bounds of the outliers are reported,
    * not the float z itself.
    */
  def anomalies(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_type"), col("value"))
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sd"))
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(col("value") > col("mu") + lit(3.0) * col("sd"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"),
        round(min(col("value")), 4).as("min_outlier"),
        round(max(col("value")), 4).as("max_outlier"))
      .orderBy("event_type")
  }

  val anomaliesSql: String =
    """WITH st AS (
      |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
      |  FROM events GROUP BY event_type
      |)
      |SELECT e.event_type, count(*) AS n_outliers,
      |       round(min(value), 4) AS min_outlier,
      |       round(max(value), 4) AS max_outlier
      |FROM events e JOIN st ON e.event_type = st.event_type
      |WHERE value > mu + 3.0 * sd
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Time-series resample + gap-fill: aggregate to an hourly grid per
    * event type, then materialize EVERY hour of the observed span
    * (dense spine = distinct types × sequence(lo..hi)) with zero-fill
    * for counts/sums and forward-fill (last non-null) for the hourly
    * average — the standard prep step before any windowed model
    * training on irregular event data.
    *
    * Scale shape: the spine is O(types × hours) — independent of
    * event volume — built from a broadcast one-row bounds agg; the
    * left join hashes on (type, bucket); the forward fill is a
    * per-type ordered window (types partition the work).
    */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .withColumn("bucket", expr(s"ts_us div ${HourUs}L"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        // avg of 2-decimal values lands on REAL .5 ties at any fixed
        // rounding precision (avg = cents/(100·n), arbitrary n), and
        // Spark HALF_UP vs DuckDB decimal-value rounding then split
        // on bit-identical doubles (observed at sf0.1: exact avg
        // 58.47375). Exact integer-cents numerator + ONE identical
        // float division, NO rounding → bit-identical doubles in
        // both engines, and as a BIGINT sum it is also the 100-TB
        // form: order-independent under partial aggregation, unlike
        // a float sum
        (sum(round(col("value") * 100).cast("long"))
          / (lit(100.0) * count(lit(1)))).as("avg_value"))
    densifyHourly(hourly)
  }

  /** Densify a sparse hourly aggregate (event_type, bucket, n_events,
    * sum_value, avg_value): dense per-type spine over the global
    * bucket range, zero-filled counts/sums, forward-filled average,
    * is_gap marker. SHARED by the batch gap-fill and the streaming
    * gap-fill (which feeds the drained sink through it) — the
    * stream ≡ batch equivalence their common oracle asserts is
    * structural, not two hand-synced copies.
    */
  private[graft] def densifyHourly(sparse: DataFrame): DataFrame = {
    val bounds = sparse.agg(min(col("bucket")).as("lo"),
      max(col("bucket")).as("hi"))
    val spine = sparse.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val ffill = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(sparse, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
        last(col("avg_value"), ignoreNulls = true).over(ffill)
          .as("filled_avg"),
        col("n_events").isNull.as("is_gap"))
      .orderBy("event_type", "bucket")
  }

  val gapFillSql: String =
    """WITH agg AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
      |         count(*) AS n_events, round(sum(value), 4) AS sum_value,
      |         sum(CAST(round(value * 100) AS BIGINT)) / (100.0 * count(*))
      |           AS avg_value
      |  FROM events GROUP BY 1, 2
      |), bounds AS (
      |  SELECT min(epoch_us(ts) // 3600000000) AS lo,
      |         max(epoch_us(ts) // 3600000000) AS hi FROM events
      |), spine AS (
      |  SELECT t.event_type, s.bucket
      |  FROM (SELECT DISTINCT event_type FROM events) t, bounds,
      |       LATERAL (SELECT unnest(generate_series(bounds.lo, bounds.hi))
      |                AS bucket) s
      |)
      |SELECT spine.event_type AS event_type, spine.bucket AS bucket,
      |       coalesce(n_events, 0) AS n_events,
      |       coalesce(sum_value, 0.0) AS sum_value,
      |       last_value(avg_value IGNORE NULLS) OVER (
      |         PARTITION BY spine.event_type ORDER BY spine.bucket
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS filled_avg,
      |       (n_events IS NULL) AS is_gap
      |FROM spine LEFT JOIN agg
      |  ON spine.event_type = agg.event_type AND spine.bucket = agg.bucket
      |ORDER BY event_type, bucket""".stripMargin

  /** Time-RANGE window frame: per-event trailing-hour count and sum
    * over a RangeFrame (peers by ts value, not row position) — the
    * complement of the rows-frame windows elsewhere in the suite.
    * Deterministic under timestamp ties because RANGE frames include
    * all peers in both engines.
    */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"))
      .rangeBetween(-HourUs, 0)
    events(s, d)
      .select(col("event_id"), col("event_type"), col("ts_us"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value")).over(w), 4).as("sum_1h"))
      .orderBy("event_id")
  }

  val rangeFrameSql: String =
    """SELECT event_id, event_type, epoch_us(ts) AS ts_us,
      |       count(*) OVER w AS n_1h,
      |       round(sum(value) OVER w, 4) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Interval-overlap join via bucketization — the scale path for
    * non-equi time joins. Build side: "incident" intervals = hot
    * hours (count > 1.2× the hourly mean, scale-free) merged into
    * maximal islands (gaps-and-islands over the hour sequence).
    * Probe side: per-user-per-day activity intervals [first,last].
    * A raw overlap join has no equi key (cartesian + filter); instead
    * each incident explodes to the DAYS it covers and the join runs
    * as a day-bucket equi-join with the overlap predicate as a
    * residual — shuffle on the bucket, never corpus × incidents.
    * A user-day interval owns exactly one day bucket, so no pair
    * dedup is needed. All arithmetic is integer µs; the oracle
    * replays the plain nested-loop overlap join.
    */
  /** Level-1 islands of a hot-hour relation, partitioned by day:
    * per-day maximal runs of consecutive hot hours, each flagged
    * `edge` when it touches a day boundary (only those can continue
    * across midnight). At most one fragment touches each edge of a
    * day, so the edge subset is ≤ 2 rows/day — the bound the level-2
    * stitch window rests on (spec-asserted).
    */
  private[graft] def islandFragments(hot: DataFrame): DataFrame = {
    val wDay = Window.partitionBy(col("day0")).orderBy(col("hour"))
    hot.select(expr("hour div 24").as("day0"), col("hour"))
      .select(col("day0"), col("hour"),
        (col("hour") - row_number().over(wDay)).as("grp"))
      .groupBy(col("day0"), col("grp"))
      .agg(min(col("hour")).as("h_start"), max(col("hour")).as("h_end"))
      .withColumn("edge",
        col("h_start") % 24 === 0 || col("h_end") % 24 === 23)
  }

  /** Spec hook: the hot-hour relation intervalJoin derives its
    * incidents from.
    */
  private[graft] def hotHours(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("ts_us"))
    val hourly = ev.groupBy(expr(s"ts_us div ${HourUs}L").as("hour"))
      .agg(count(lit(1)).as("n"))
    val thresh = hourly.agg((avg(col("n")) * 1.2).as("t"))
    hourly.crossJoin(broadcast(thresh)).filter(col("n") > col("t"))
      .select(col("hour"))
  }

  def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val DayUs = 86400L * 1000000L
    val ev = events(s, d)
      .select(col("user_id"), col("ts_us"))
    val spans = ev
      .withColumn("day", expr(s"ts_us div ${DayUs}L"))
      .groupBy(col("user_id"), col("day"))
      .agg(min(col("ts_us")).as("a_start"), max(col("ts_us")).as("a_end"))
    // Gaps-and-islands hierarchically, so no window ever sees the full
    // hot-hour relation in one partition:
    //  level 1 — islands WITHIN each day (window partitioned by day;
    //    ≤24 rows per partition by construction). A fragment that
    //    touches neither day edge is globally maximal (its flanking
    //    hours in the same day are provably cold) and is final as-is.
    //  level 2 — only edge-touching fragments can continue across
    //    midnight; stitch them by hour-adjacency. That relation is
    //    bounded by 2 rows per day (one fragment can touch each edge)
    //    — timeline-metadata-sized, independent of data volume, and
    //    12×+ smaller than the hot-hour set the previous single
    //    global window sorted.
    val frags = islandFragments(hotHours(s, d))
    val wStitch = Window.orderBy(col("h_start")) // ≤ 2 rows/day input
    val stitched = frags.filter(col("edge"))
      .withColumn("brk",
        when(col("h_start") ===
          lag(col("h_end"), 1).over(wStitch) + 1, 0).otherwise(1))
      .withColumn("chain", sum(col("brk")).over(wStitch))
      .groupBy(col("chain"))
      .agg(min(col("h_start")).as("h_start"), max(col("h_end")).as("h_end"))
    val incidents = frags.filter(!col("edge"))
      .select(col("h_start"), col("h_end"))
      .unionByName(stitched.select(col("h_start"), col("h_end")))
      .select((col("h_start") * HourUs).as("b_start"),
        ((col("h_end") + 1) * HourUs).as("b_end"))
    val bDays = incidents.select(col("b_start"), col("b_end"),
      explode(sequence(expr(s"b_start div ${DayUs}L"),
        expr(s"(b_end - 1) div ${DayUs}L"))).as("day"))
    spans.join(bDays, Seq("day"))
      .filter(col("a_start") < col("b_end") && col("b_start") <= col("a_end"))
      .groupBy(col("b_start"), col("b_end"))
      .agg(count(lit(1)).as("n_intervals"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("b_start")
  }

  val intervalJoinSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us FROM events
      |), spans AS (
      |  SELECT user_id, ts_us // 86400000000 AS day,
      |         min(ts_us) AS a_start, max(ts_us) AS a_end
      |  FROM ev GROUP BY 1, 2
      |), hourly AS (
      |  SELECT ts_us // 3600000000 AS hour, count(*) AS n
      |  FROM ev GROUP BY 1
      |), hot AS (
      |  SELECT hour FROM hourly WHERE n > (SELECT avg(n) * 1.2 FROM hourly)
      |), isl AS (
      |  SELECT hour, hour - row_number() OVER (ORDER BY hour) AS grp
      |  FROM hot
      |), incidents AS (
      |  SELECT min(hour) * 3600000000 AS b_start,
      |         (max(hour) + 1) * 3600000000 AS b_end
      |  FROM isl GROUP BY grp
      |)
      |SELECT b_start, b_end, count(*) AS n_intervals,
      |       count(DISTINCT user_id) AS n_users
      |FROM incidents i JOIN spans s
      |  ON s.a_start < i.b_end AND i.b_start <= s.a_end
      |GROUP BY 1, 2 ORDER BY b_start""".stripMargin

  /** Secondary sort: the repartitionAndSortWithinPartitions pattern in
    * DataFrame form — `repartition(key)` hash-routes every user to one
    * partition, `sortWithinPartitions(key, ts, id)` gives each task its
    * users' rows contiguously and time-ordered, and ONE imperative
    * mapPartitions pass computes per-user sequence stats (event count,
    * max inter-event gap, count of non-decreasing value runs) with O(1)
    * state per task. This is the scale shape for per-key ordered
    * iteration the window formulation can't always express (e.g. state
    * machines): no per-key groupBy materialization, no driver state,
    * sort amortized across all users in a partition. The oracle is the
    * equivalent lag()-window SQL — proving pass ≡ window algebra.
    */
  def secondarySort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sorted = events(s, d)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long, Double)]
    sorted.mapPartitions { it =>
      // per-user accumulators flushed on key change; the partition's
      // result set is O(#users in partition), not O(#events)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var cur = 0L; var seen = false
      var n = 0L; var maxGap = 0L; var runs = 0L
      var prevTs = 0L; var prevV = 0.0
      def flush(): Unit = if (seen) out += ((cur, n, maxGap, runs))
      it.foreach { case (u, ts, _, v) =>
        if (!seen || u != cur) {
          flush(); cur = u; seen = true
          n = 0L; maxGap = 0L; runs = 1L; prevTs = ts; prevV = v
        } else {
          if (ts - prevTs > maxGap) maxGap = ts - prevTs
          if (v < prevV) runs += 1
        }
        n += 1; prevTs = ts; prevV = v
      }
      flush()
      out.iterator
    }.toDF("user_id", "n_events", "max_gap_us", "n_runs")
      .orderBy("user_id")
  }

  val secondarySortSql: String =
    """WITH o AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value,
      |         lag(value) OVER w AS pv,
      |         lag(epoch_us(ts)) OVER w AS pts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |)
      |SELECT user_id, count(*) AS n_events,
      |       coalesce(max(ts_us - pts), 0) AS max_gap_us,
      |       CAST(1 + sum(CASE WHEN value < pv THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_runs
      |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin

  private val ReservoirK = 3

  /** Per-key reservoir sample, k=3 events per user, deterministic:
    * priority sampling with a content-hash uniform (md5 of event_id)
    * instead of RNG state. Top-k-by-priority per key IS a mergeable
    * reservoir — partial top-k lists from different partitions (or
    * different days of a 100 TB corpus) union and re-rank to exactly
    * the sample a single pass would draw, which RNG reservoirs can't
    * do without order-dependence. One shuffle on user_id; no global
    * sort.
    */
  def reservoirSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("h"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        md5(col("event_id").cast("string")).as("h"))
      .withColumn("slot", row_number().over(w))
      .filter(col("slot") <= ReservoirK)
      .select(col("user_id"), col("slot").cast("long").as("slot"),
        col("event_id"), col("event_type"))
      .orderBy("user_id", "slot")
  }

  val reservoirSampleSql: String =
    """WITH ranked AS (
      |  SELECT user_id, event_id, event_type,
      |         md5(CAST(event_id AS VARCHAR)) AS h,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY md5(CAST(event_id AS VARCHAR)),
      |                                     event_id) AS slot
      |  FROM events
      |)
      |SELECT user_id, CAST(slot AS BIGINT) AS slot, event_id, event_type
      |FROM ranked WHERE slot <= 3 ORDER BY user_id, slot""".stripMargin

  /** Per-user event-type transition matrix — the Markov/sequence-model
    * statistic behind next-action features and behavioral-sequence
    * training data: lag(event_type) over each user's (ts_us,
    * event_id)-ordered stream (the unique event id breaks any
    * equal-µs tie, so the sequence — unlike a bare-timestamp sort —
    * is total and engine-independent), then (prev → curr) counts and
    * the row-normalized transition probability.
    *
    * Plan shape at scale: one shuffle by user_id for the lag window
    * (each user's sequence is independent — the streaming-compatible
    * per-key formulation), then a partial-agg groupBy that collapses
    * to at most |types|² rows BEFORE its exchange, and a final
    * window-sum over a matrix that is O(1) in the corpus. Nothing
    * downstream of the first shuffle scales with the data.
    *
    * Float discipline: p = n / n_from is two exact BIGINTs into ONE
    * IEEE division — bit-identical across engines, no rounding — and
    * the sort keys are the (prev_type, event_type) strings, never the
    * float.
    */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val counts = events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("event_type"), col("n"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
      .orderBy("prev_type", "event_type")
  }

  /** Same shapes: lag over the identical total order, BIGINT counts,
    * one cast-then-divide (DuckDB's window sum over BIGINT is HUGEINT
    * — cast BEFORE the division so both engines divide doubles from
    * exact integers).
    */
  val transitionsSql: String =
    """WITH seq AS (
      |  SELECT event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY epoch_us(ts), event_id)
      |           AS prev_type
      |  FROM events
      |), t AS (
      |  SELECT prev_type, event_type, count(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT prev_type, event_type, n,
      |       CAST(n AS DOUBLE)
      |         / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
      |FROM t ORDER BY prev_type, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_transitions"     -> (transitions _),
    "events_secondary_sort"  -> (secondarySort _),
    "events_reservoir"       -> (reservoirSample _),
    "events_interval_join"   -> (intervalJoin _),
    "events_gapfill"         -> (gapFill _),
    "events_range_frame"     -> (rangeFrame _),
    "events_funnel"          -> (funnel _),
    "events_anomaly"         -> (anomalies _),
    "events_cohort"          -> (cohortRetention _),
    "events_topk_custom_agg" -> (topKCustomAgg _),
    "events_session_window" -> (sessionWindow _),
    "events_sliding_window" -> (slidingWindow _),
    "events_pivot"          -> (pivotCounts _),
    "events_tumbling_window" -> (tumblingWindow _),
    "events_sessionize"      -> (sessionize _),
    "events_top_per_user"    -> (topEventPerUser _),
    "events_asof_join"       -> (asofJoin _),
  )

  val oracle: Map[String, String] = Map(
    "events_transitions"     -> transitionsSql,
    "events_secondary_sort"  -> secondarySortSql,
    "events_reservoir"       -> reservoirSampleSql,
    "events_interval_join"   -> intervalJoinSql,
    "events_gapfill"         -> gapFillSql,
    "events_range_frame"     -> rangeFrameSql,
    "events_funnel"          -> funnelSql,
    "events_anomaly"         -> anomaliesSql,
    "events_cohort"          -> cohortRetentionSql,
    "events_topk_custom_agg" -> topKCustomAggSql,
    "events_session_window" -> sessionWindowSql,
    "events_sliding_window" -> slidingWindowSql,
    "events_pivot"          -> pivotCountsSql,
    "events_tumbling_window" -> tumblingWindowSql,
    "events_sessionize"      -> sessionizeSql,
    "events_top_per_user"    -> topEventPerUserSql,
    "events_asof_join"       -> asofJoinSql,
  )
}
