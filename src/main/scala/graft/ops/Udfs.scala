package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** User-defined function surface (SURVEY.md §2 op 22 generalized):
  * scalar Scala UDF, typed Aggregator UDAF, and the SQL entry point
  * (spark.sql over registered views).
  *
  * Engine guidance stands (functions > UDFs — a UDF is an opaque box
  * to Catalyst: no pushdown through it, no codegen fusion); these
  * queries exist to prove the extension surface works end-to-end, and
  * each one's math is chosen to stay DuckDB-replayable.
  */
object Udfs {

  /** Scalar UDF: vowel count per part name — oracle-replayable via
    * length arithmetic. Demonstrates registration + column use.
    */
  def scalarUdf(s: SparkSession, d: String): DataFrame = {
    val vowels = udf((name: String) => name.count("aeiou".contains(_)).toLong)
    s.udf.register("vowel_count", vowels) // SQL-callable too
    part(s, d)
      .select(col("p_partkey"), col("p_name"),
        vowels(col("p_name")).as("n_vowels"))
      .orderBy("p_partkey")
  }

  val scalarUdfSql: String =
    """SELECT p_partkey, p_name,
      |       CAST(length(p_name) - length(
      |         regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Typed Aggregator UDAF: discount-weighted mean quantity per return
    * flag — a custom two-accumulator aggregate with merge (the
    * distributed-combine contract), exactly what a custom mean/ratio
    * metric needs. Buffer is (weightedSum, weightSum); merge is
    * associative so partial aggregation works map-side.
    *
    * The accumulators are EXACT integers (quantity is integer-valued,
    * discount is 2-decimal → cents): a weighted mean is a ratio over
    * discrete data (taxonomy case 2, ops/Relational.scala) whose true
    * value can land on real decimal ties, so double accumulation +
    * rounding is the cross-engine hazard shape. Integer sums are also
    * order-independent under partial aggregation — the 100-TB form.
    * The 100x weight scaling cancels in the ratio, so finish is the
    * ONE identically-shaped float division both engines perform.
    */
  case class WAccum(var num: Long, var den: Long)

  object WeightedMeanQty
      extends Aggregator[(Double, Double), WAccum, Double] {
    override def zero: WAccum = WAccum(0L, 0L)
    override def reduce(b: WAccum, in: (Double, Double)): WAccum = {
      val wCents = math.round(in._2 * 100)
      b.num += math.round(in._1) * wCents; b.den += wCents; b
    }
    override def merge(a: WAccum, b: WAccum): WAccum = {
      a.num += b.num; a.den += b.den; a
    }
    override def finish(r: WAccum): Double = r.num.toDouble / r.den.toDouble
    override def bufferEncoder = Encoders.product[WAccum]
    override def outputEncoder = Encoders.scalaDouble
  }

  def udafWeightedMean(s: SparkSession, d: String): DataFrame = {
    val wmean = udaf(WeightedMeanQty)
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wmean(col("l_quantity"), col("l_discount"))
        .as("disc_weighted_qty"))
      .orderBy("l_returnflag")
  }

  val udafWeightedMeanSql: String =
    """SELECT l_returnflag,
      |       sum(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT))
      |         / sum(CAST(round(l_discount * 100) AS BIGINT))
      |         AS disc_weighted_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** SQL entry point: register the testdata as views and run ANSI SQL
    * through spark.sql — TPC-H Q3 shape. One plan: the SQL text and
    * the DataFrame DSL meet in the same Catalyst pipeline.
    */
  def sqlApi(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("v_customer")
    orders(s, d).createOrReplaceTempView("v_orders")
    lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT o_orderkey,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |       o_orderdate
        |FROM v_customer
        |JOIN v_orders   ON c_custkey = o_custkey
        |JOIN v_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 20""".stripMargin)
  }

  val sqlApiSql: String =
    """SELECT o_orderkey,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |       o_orderdate
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-01-01'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** Subquery surface: an uncorrelated scalar subquery (global avg)
    * and a correlated EXISTS, both through spark.sql. Catalyst plans
    * the scalar subquery as a one-row broadcast and decorrelates the
    * EXISTS into a semi-join.
    */
  def sqlSubqueries(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("v_orders")
    lineitem(s, d).createOrReplaceTempView("v_lineitem")
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM v_orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM v_orders)
        |  AND EXISTS (SELECT 1 FROM v_lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val sqlSubqueriesSql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_quantity >= 45)
      |ORDER BY o_orderkey""".stripMargin

  /** Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL form): generate
    * a month spine and left-join the order counts — months with no
    * orders surface as explicit zeros. The recursion is acyclic
    * (monotone date increment), which is exactly the shape Spark 4's
    * recursive CTEs support; DuckDB replays the identical SQL.
    */
  def sqlRecursiveCte(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("v_orders")
    s.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT TIMESTAMP '1995-01-01'
        |  UNION ALL
        |  SELECT m + INTERVAL '1' MONTH FROM months
        |  WHERE m < TIMESTAMP '2001-12-01'
        |)
        |SELECT m AS month, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM months
        |LEFT JOIN (SELECT date_trunc('month', o_orderdate) AS mo,
        |                  count(*) AS n
        |           FROM v_orders GROUP BY 1) o ON m = mo
        |ORDER BY month""".stripMargin)
  }

  val sqlRecursiveCteSql: String =
    """WITH RECURSIVE months(m) AS (
      |  SELECT TIMESTAMP '1995-01-01'
      |  UNION ALL
      |  SELECT m + INTERVAL 1 MONTH FROM months
      |  WHERE m < TIMESTAMP '2001-12-01'
      |)
      |SELECT m AS month, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
      |FROM months
      |LEFT JOIN (SELECT date_trunc('month', o_orderdate) AS mo,
      |                  count(*) AS n
      |           FROM orders GROUP BY 1) o ON m = mo
      |ORDER BY month""".stripMargin

  /** Correlated LATERAL subquery: per-customer top-2 orders via a
    * correlated ordered-limit subquery in the FROM clause — the SQL
    * form of "top-n per key" (Catalyst decorrelates it into a ranked
    * join). Identical syntax and semantics in DuckDB.
    */
  def sqlLateral(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("v_customer")
    orders(s, d).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM v_customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM v_orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey < 100
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  val sqlLateralSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_custkey < 100
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** Optimizer-extension demo: the query is written in the PURE
    * declarative form (aggregate ∘ zip_with dot product); the
    * injected FuseDotProduct rule (functions/OptimizerRules) rewrites
    * it to the fused native loop at optimization time — same result,
    * interpreted-lambda overhead gone. The rewrite is spec-asserted
    * on the optimized plan; the oracle replays the arithmetic, which
    * is rewrite-invariant by construction.
    */
  def optFusedDot(s: SparkSession, d: String): DataFrame = {
    graft.functions.FuseDotProductRegistrar.ensure(s)
    val a = transform(sequence(lit(1), lit(16)),
      i => (pmod(col("p_partkey"), lit(7)) + i).cast("double"))
    val b = transform(sequence(lit(1), lit(16)),
      i => (pmod(col("p_partkey"), lit(11)) + i * 2).cast("double"))
    part(s, d).filter(col("p_partkey") < 500)
      .select(col("p_partkey"),
        Similarity.dot(a, b).as("dot"))
      .orderBy("p_partkey")
  }

  val optFusedDotSql: String =
    """SELECT p_partkey,
      |       CAST(list_sum(list_transform(generate_series(1, 16),
      |         i -> CAST(p_partkey % 7 + i AS DOUBLE)
      |              * CAST(p_partkey % 11 + 2 * i AS DOUBLE))) AS DOUBLE)
      |         AS dot
      |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin

  /** Whole-operator extension demo: grouped top-k through the custom
    * GroupedTopK LogicalPlan → GroupedTopKStrategy → GroupedTopKExec
    * pipeline (graft.plans) — one shuffle, bounded per-key heaps, no
    * input sort. The oracle replays the semantics with the standard
    * window formulation.
    */
  def optGroupedTopK(s: SparkSession, d: String): DataFrame =
    graft.plans.GroupedTopKApi.topKPerKey(s,
      orders(s, d).select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice")),
      Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
      .orderBy(col("o_orderpriority"), desc("o_totalprice"),
        col("o_orderkey"))

  val optGroupedTopKSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  /** UDTF analog: typed `Dataset.flatMap` — arbitrary Scala producing
    * 0..n rows per input row (the table-function contract). Runs in
    * the scan stage like a generator; unlike `explode` the row logic
    * is open-ended imperative code.
    */
  def flatMapUdtf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d).filter(col("p_partkey") < 500)
      .select(col("p_partkey"), col("p_name")).as[(Long, String)]
      .flatMap { case (key, name) =>
        name.split(" ").iterator.filter(_.nonEmpty).zipWithIndex.map {
          case (word, i) => (key, i, word, word.length.toLong)
        }
      }
      .toDF("p_partkey", "word_idx", "word", "word_len")
      .orderBy("p_partkey", "word_idx")
  }

  val flatMapUdtfSql: String =
    """WITH t AS (
      |  SELECT p_partkey,
      |         list_filter(string_split(p_name, ' '), x -> x != '') AS ws
      |  FROM part WHERE p_partkey < 500
      |)
      |SELECT p_partkey, i - 1 AS word_idx, ws[i] AS word,
      |       CAST(length(ws[i]) AS BIGINT) AS word_len
      |FROM t, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) u
      |ORDER BY p_partkey, word_idx""".stripMargin

  /** The SQL-text surface of the custom expressions: graft_shingles /
    * graft_jaccard registered in the session's FunctionRegistry
    * (GraftFunctionRegistrar — the live-session analog of
    * SparkSessionExtensions.injectFunction), then used from plain
    * `spark.sql` text. Proves a SQL-only user reaches the fused
    * codegen kernels; result replays the pairwise-Jaccard oracle on a
    * bounded block.
    */
  def sqlGraftFunctions(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctionRegistrar.ensure(s)
    documents(s, d).createOrReplaceTempView("v_documents")
    s.sql(
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       round(graft_jaccard(graft_shingles(a.text),
        |                           graft_shingles(b.text)), 6) AS jaccard
        |FROM v_documents a JOIN v_documents b ON a.doc_id < b.doc_id
        |WHERE a.doc_id < 60 AND b.doc_id < 60
        |ORDER BY jaccard DESC, a_id, b_id
        |LIMIT 25""".stripMargin)
  }

  val sqlGraftFunctionsSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_sort(list_distinct(
      |           CASE WHEN len(toks) >= 3
      |                THEN list_transform(range(1, len(toks) - 1),
      |                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |                ELSE [coalesce(list_aggr(toks, 'string_agg', ' '), '')]
      |                END)) AS sh
      |  FROM (SELECT doc_id,
      |               list_filter(string_split_regex(text, '\s+'), x -> x != '')
      |                 AS toks
      |        FROM documents WHERE doc_id < 60)
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      |FROM t a JOIN t b ON a.doc_id < b.doc_id
      |ORDER BY jaccard DESC, a_id, b_id LIMIT 25""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_graft_functions" -> (sqlGraftFunctions _),
    "udf_scalar"        -> (scalarUdf _),
    "udaf_weighted_mean" -> (udafWeightedMean _),
    "udtf_flatmap"      -> (flatMapUdtf _),
    "sql_api_q3"        -> (sqlApi _),
    "sql_subqueries"    -> (sqlSubqueries _),
    "sql_recursive_cte" -> (sqlRecursiveCte _),
    "sql_lateral_topn"  -> (sqlLateral _),
    "opt_fused_dot"     -> (optFusedDot _),
    "opt_grouped_topk"  -> (optGroupedTopK _),
  )

  val oracle: Map[String, String] = Map(
    "sql_graft_functions" -> sqlGraftFunctionsSql,
    "udf_scalar"        -> scalarUdfSql,
    "udaf_weighted_mean" -> udafWeightedMeanSql,
    "udtf_flatmap"      -> flatMapUdtfSql,
    "sql_api_q3"        -> sqlApiSql,
    "sql_subqueries"    -> sqlSubqueriesSql,
    "sql_recursive_cte" -> sqlRecursiveCteSql,
    "sql_lateral_topn"  -> sqlLateralSql,
    "opt_fused_dot"     -> optFusedDotSql,
    "opt_grouped_topk"  -> optGroupedTopKSql,
  )
}
