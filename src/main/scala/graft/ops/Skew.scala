package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Skew-handling and sketch aggregates.
  *
  * `saltedAgg` is the canonical hot-key pattern: lineitem grouped by
  * l_returnflag has only 3 keys, so a direct groupBy concentrates all
  * 600k rows (100 TB: billions) onto 3 reducers. Salting splits each
  * key into 16 sub-keys for the partial aggregate, then merges the
  * partials in a second (tiny) aggregate — the classic two-phase
  * rewrite AQE's skew mitigation automates for joins but NOT for
  * aggregations with low-cardinality keys. The result is bit-identical
  * to the direct groupBy (associative aggregates only), which is
  * exactly what the DuckDB oracle checks.
  */
object Skew {

  private val SaltBuckets = 16

  def saltedAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      // deterministic salt (not rand(): reproducible plans, and the
      // line number is already uniformly distributed)
      .withColumn("salt", pmod(col("l_orderkey") * 31 + col("l_linenumber"),
        lit(SaltBuckets)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        sum(col("l_quantity")).as("p_qty"),
        count(lit(1)).as("p_n"),
        max(col("l_extendedprice")).as("p_max"))
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("p_qty")), 2).as("sum_qty"),
        sum(col("p_n")).as("n"),
        max(col("p_max")).as("max_price"))
      .orderBy("l_returnflag")

  val saltedAggSql: String =
    """SELECT l_returnflag,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS n,
      |       max(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sketch aggregates: HyperLogLog++ distinct counts and quantile
    * sketches — the 100-TB substitutes for exact countDistinct /
    * median. Approximate by construction → rows-only for the driver;
    * SkewSketchSpec bounds the error against exact values. (HLL
    * register-max merging is partition-order-independent; the
    * percentile sketch is NOT — its exact value can shift with
    * parallelism, verified empirically — which is precisely why this
    * query is excluded from the hash oracle.)
    */
  def sketchAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.02)
          .as("approx_orders"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"))
      .orderBy("l_returnflag")

  /** Runtime bloom-filter join pruning: a selective creation side
    * (filtered orders) injects a `might_contain` bloom probe into the
    * lineitem scan, discarding non-joining rows BEFORE the shuffle —
    * at 100 TB this is the difference between shuffling the whole
    * fact table and shuffling the ~1% that can match.
    *
    * Spark only injects when the creation side is NOT broadcastable,
    * so broadcast is disabled for the duration of this query's
    * EXECUTION (hence the materialize-inside / restore-conf dance —
    * plans re-optimize at action time) and restored after. The bloom
    * plan is asserted in SkewSketchSpec; results are exact (bloom is
    * false-positive-only, the join re-checks), so the oracle is plain
    * SQL.
    */
  def bloomJoin(s: SparkSession, d: String): DataFrame = {
    val restore = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        s.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        s.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val out = bloomJoinPlan(s, d)
      // materialize while the confs are live (optimization happens at
      // action time, not DataFrame-construction time)
      val rows = out.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), out.schema)
    } finally restore.foreach { case (k, v) => s.conf.set(k, v) }
  }

  /** The lazy plan (separate so the spec can explain() it under the
    * bloom confs).
    */
  private[graft] def bloomJoinPlan(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(
        orders(s, d).filter(col("o_orderpriority") === "1-URGENT"
          && col("o_totalprice") > 80000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy("o_orderpriority")

  val bloomJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 80000.0
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> (saltedAgg _),
    "sketch_agg"      -> (sketchAgg _),
    "bloom_join"      -> (bloomJoin _),
  )

  val oracle: Map[String, String] = Map(
    "skew_salted_agg" -> saltedAggSql,
    "bloom_join"      -> bloomJoinSql,
    // sketch_agg: approximate → rows-only; error-bounded in SketchSpec
  )
}
