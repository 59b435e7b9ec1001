package graft

import org.apache.spark.sql.functions._
import graft.functions.FuseDotProductRegistrar
import graft.ops.{Similarity, Udfs}

class OptimizerRuleSpec extends SparkTestBase {

  import spark.implicits._

  test("FuseDotProduct rewrites the declarative fold in the optimized plan") {
    FuseDotProductRegistrar.ensure(spark)
    val df = Udfs.optFusedDot(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("dotproductstrict") ||
      optimized.contains("DotProductStrict"),
      s"rule did not fire:\n$optimized")
  }

  test("the rewrite preserves results exactly (fused == interpreted)") {
    FuseDotProductRegistrar.ensure(spark)
    val a = transform(sequence(lit(1), lit(8)),
      i => (col("id") + i).cast("double"))
    val b = transform(sequence(lit(1), lit(8)),
      i => (col("id") * 2 + i).cast("double"))
    val base = spark.range(100).toDF("id")
    val fused = base.select($"id", Similarity.dot(a, b).as("d"))
      .as[(Long, Double)].collect().toMap
    // compute the reference without the rule: plain Scala
    val expected = (0L until 100L).map { id =>
      id -> (1 to 8).map(i => (id + i).toDouble * (id * 2 + i)).sum
    }.toMap
    assert(fused === expected)
  }

  test("GroupedTopK custom operator equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    val custom = graft.plans.GroupedTopKApi.topKPerKey(spark, src,
      Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
      .as[(String, Long, Double)].collect().toSet
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = src.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .as[(String, Long, Double)].collect().toSet
    assert(custom === windowed)
  }

  test("GroupedTopK plans one exchange and no sort") {
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    val df = graft.plans.GroupedTopKApi.topKPerKey(spark, src,
      Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
    df.collect()
    // inspect only the final adaptive plan (the dump repeats the
    // initial plan below it); the exec node prints as "GroupedTopK"
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(plan.contains("GroupedTopK"), plan)
    assert(!plan.contains("Sort "), s"custom top-k must not sort:\n$plan")
    assert("Exchange".r.findAllIn(plan).length === 1, plan)
  }

  test("GroupedTopK edge cases: k larger than groups, ties, empty input") {
    import spark.implicits._
    // groups smaller than k: every row survives
    val small = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0))
      .toDF("g", "id", "v")
    val allRows = graft.plans.GroupedTopKApi
      .topKPerKey(spark, small, Seq("g"), "v", "id", 5)
      .as[(String, Long, Double)].collect().toSet
    assert(allRows ===
      Set(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0)))
    // exact ties on the order column resolve by the tie column (asc)
    val tied = Seq(("a", 3L, 9.0), ("a", 1L, 9.0), ("a", 2L, 9.0))
      .toDF("g", "id", "v")
    val top2 = graft.plans.GroupedTopKApi
      .topKPerKey(spark, tied, Seq("g"), "v", "id", 2)
      .as[(String, Long, Double)].collect().map(_._2).toSet
    assert(top2 === Set(1L, 2L))
    // empty input: empty output, no failure
    val empty = graft.plans.GroupedTopKApi.topKPerKey(spark,
      small.filter($"v" > 1000), Seq("g"), "v", "id", 3)
    assert(empty.count() === 0)
  }

  test("SQL functions registered on a live session resolve from SQL text") {
    graft.functions.GraftFunctionRegistrar.ensure(spark)
    val r = spark.sql(
      """SELECT graft_jaccard(graft_shingles('a b c d'),
        |                     graft_shingles('b c d e')) AS j,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       size(graft_chunk_fps('one two three')) AS n""".stripMargin)
      .collect().head
    // shingles: {a b c, b c d} vs {b c d, c d e}: inter=1, union=3
    assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-12)
    assert(r.getDouble(1) === 11.0)
    assert(r.getInt(2) === 1)
  }

  test("unequal lengths still yield NULL (zip_with semantics preserved)") {
    FuseDotProductRegistrar.ensure(spark)
    val a = transform(sequence(lit(1), lit(4)), i => i.cast("double"))
    val b = transform(sequence(lit(1), lit(6)), i => i.cast("double"))
    val out = spark.range(1).select(Similarity.dot(a, b).as("d"))
      .collect().head
    assert(out.isNullAt(0), s"expected NULL for unequal lengths, got $out")
  }
}
