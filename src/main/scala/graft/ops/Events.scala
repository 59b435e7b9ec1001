package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables._

/** Event-stream analytics over the `events` table (`ts` = epoch
  * nanoseconds as BIGINT — see Tables.events for the parquet NANOS
  * quirk). Batch forms here; the Structured Streaming surface over the
  * same shapes lives in graft.streaming.
  *
  * All timestamp arithmetic stays in integer nanoseconds (BIGINT) so
  * both engines compute identical values (DuckDB side uses
  * epoch_ns(ts)).
  */
object Events {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val SessionGapNs = 30L * 60 * 1000 * 1000 * 1000 // 30 min

  /** Tumbling 1-hour window aggregation by event type: the batch
    * equivalent of `groupBy(window($"ts", "1 hour"), $"event_type")`.
    * Integer-division bucketing → plain grouped agg, partial combine,
    * one shuffle on (bucket, event_type).
    */
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("bucket", expr(s"ts div ${HourNs}L"))
      .groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("bucket", "event_type")

  val tumblingWindowSql: String =
    """SELECT epoch_ns(ts) // 3600000000000 AS bucket, event_type,
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
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || col("ts") - col("prev_ts") > SessionGapNs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        // integer division in BOTH engines (Spark `div`, DuckDB `//`):
        // float-division-then-cast truncates in Spark but rounds in DuckDB
        expr("(max(ts) - min(ts)) div 1000000").as("duration_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        max(col("duration_ms")).as("max_session_ms"))
      .orderBy("user_id")
  }

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, epoch_ns(ts) AS tsn,
      |         CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
      |                OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts))
      |), sess AS (
      |  SELECT user_id, tsn,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY tsn
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked
      |), per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |         (max(tsn) - min(tsn)) // 1000000 AS duration_ms
      |  FROM sess GROUP BY 1, 2
      |)
      |SELECT user_id, count(*) AS n_sessions,
      |       max(n_events) AS max_session_events,
      |       max(duration_ms) AS max_session_ms
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Top event value per user per type via rank — dedup/top-1 pattern
    * over a keyed stream (keep the latest high-value event).
    */
  def topEventPerUser(s: SparkSession, d: String): DataFrame = {
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_tumbling_window" -> (tumblingWindow _),
    "events_sessionize"      -> (sessionize _),
    "events_top_per_user"    -> (topEventPerUser _),
  )

  val oracle: Map[String, String] = Map(
    "events_tumbling_window" -> tumblingWindowSql,
    "events_sessionize"      -> sessionizeSql,
    "events_top_per_user"    -> topEventPerUserSql,
  )
}
