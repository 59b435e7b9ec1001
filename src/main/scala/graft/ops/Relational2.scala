package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Second relational batch: the standard-taxonomy operators the
  * reference never touches (SURVEY.md §2.1 "doesn't have") but a
  * complete engine must — outer joins, set ops, rollup, date/string
  * scalar functions, statistical aggregates, JSON extraction. Same
  * determinism contract as Relational.
  */
object Relational2 {

  /** Left + full outer joins with null-aware output. The supplier
    * side is tiny (broadcastable); nulls from the outer side are
    * made explicit via coalesce so the oracle comparison is
    * null-stable.
    */
  def outerJoin(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"))
    supplier(s, d)
      .join(li, col("s_suppkey") === col("l_suppkey"), "left_outer")
      .select(col("s_suppkey"), col("s_name"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
      .orderBy("s_suppkey")
  }

  val outerJoinSql: String =
    """SELECT s_suppkey, s_name, coalesce(n_lines, 0) AS n_lines
      |FROM supplier
      |LEFT JOIN (SELECT l_suppkey, count(*) AS n_lines
      |           FROM lineitem GROUP BY l_suppkey) li
      |  ON s_suppkey = l_suppkey
      |ORDER BY s_suppkey""".stripMargin

  /** Set operations: INTERSECT and EXCEPT (set semantics — dedup),
    * planned as semi/anti joins over distinct inputs.
    */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val early = orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val highValue = orders(s, d).filter(col("o_totalprice") > 30000.0)
      .select(col("o_custkey"))
    early.intersect(highValue)
      .withColumn("tag", lit("both"))
      .unionByName(
        early.except(highValue).withColumn("tag", lit("early_only")))
      .orderBy("tag", "o_custkey")
  }

  val setOpsSql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, 'both' AS tag FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |    INTERSECT
      |    SELECT o_custkey FROM orders WHERE o_totalprice > 30000.0)
      |  UNION ALL
      |  SELECT o_custkey, 'early_only' AS tag FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |    EXCEPT
      |    SELECT o_custkey FROM orders WHERE o_totalprice > 30000.0)
      |) ORDER BY tag, o_custkey""".stripMargin

  /** ROLLUP aggregation — subtotal rows per (returnflag) and grand
    * total; grouping-set nulls coalesced to a sentinel so the oracle
    * hash is null-stable.
    */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy("flag", "status")

  val rollupAggSql: String =
    """SELECT coalesce(l_returnflag, '<all>') AS flag,
      |       coalesce(l_linestatus, '<all>') AS status,
      |       count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin

  /** Date/time scalar functions over the events table's canonical
    * `event_time` (µs TIMESTAMP, UTC both engines):
    * year/month/day/hour/dayofweek + date_trunc.
    * Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday → +1.
    */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("t", col("event_time"))
      .groupBy(
        year(col("t")).as("y"),
        month(col("t")).as("m"),
        dayofweek(col("t")).as("dow"))
      .agg(count(lit(1)).as("n"),
        min(hour(col("t"))).as("min_hour"),
        max(dayofmonth(col("t"))).as("max_day"))
      .orderBy("y", "m", "dow")

  val dateFuncsSql: String =
    """SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
      |       CAST(dayofweek(ts) + 1 AS INT) AS dow,
      |       count(*) AS n,
      |       CAST(min(hour(ts)) AS INT) AS min_hour,
      |       CAST(max(day(ts)) AS INT) AS max_day
      |FROM events GROUP BY 1, 2, 3 ORDER BY y, m, dow""".stripMargin

  /** String scalar functions with identical cross-engine semantics:
    * upper/lower/substring/replace/trim/lpad/reverse/translate/concat.
    */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 5).as("first5"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        lpad(col("p_brand"), 12, "#").as("padded"),
        reverse(col("p_type")).as("rev_type"),
        translate(col("p_name"), "ab", "xy").as("trans"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        length(trim(col("p_name"))).cast("long").as("trimlen"))
      .orderBy("p_partkey")

  val stringFuncsSql: String =
    """SELECT p_partkey,
      |       upper(p_name) AS up,
      |       substring(p_name, 1, 5) AS first5,
      |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
      |       lpad(p_brand, 12, '#') AS padded,
      |       reverse(p_type) AS rev_type,
      |       translate(p_name, 'ab', 'xy') AS trans,
      |       concat_ws('|', p_brand, p_type) AS joined,
      |       CAST(length(trim(p_name)) AS BIGINT) AS trimlen
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Statistical aggregates: stddev/variance (sample), median over
    * integer-valued doubles (exact in both engines), correlation.
    */
  def statsAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        median(col("l_quantity")).as("med_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qty_price_corr"))
      .orderBy("l_returnflag")

  val statsAggSql: String =
    """SELECT l_returnflag,
      |       round(stddev_samp(l_quantity), 4) AS sd_qty,
      |       round(var_samp(l_quantity), 4) AS var_qty,
      |       median(l_quantity) AS med_qty,
      |       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** JSON extraction from the events `props` column (semi-structured
    * payloads — a staple of event pipelines). get_json_object walks
    * the document without full parse; grouped stats over the
    * extracted value.
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """SELECT event_type,
      |       count(k) AS n_with_k,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_outer_join"   -> (outerJoin _),
    "rel_set_ops"      -> (setOps _),
    "rel_rollup"       -> (rollupAgg _),
    "rel_date_funcs"   -> (dateFuncs _),
    "rel_string_funcs" -> (stringFuncs _),
    "rel_stats_agg"    -> (statsAgg _),
    "rel_json_extract" -> (jsonExtract _),
  )

  val oracle: Map[String, String] = Map(
    "rel_outer_join"   -> outerJoinSql,
    "rel_set_ops"      -> setOpsSql,
    "rel_rollup"       -> rollupAggSql,
    "rel_date_funcs"   -> dateFuncsSql,
    "rel_string_funcs" -> stringFuncsSql,
    "rel_stats_agg"    -> statsAggSql,
    "rel_json_extract" -> jsonExtractSql,
  )
}
