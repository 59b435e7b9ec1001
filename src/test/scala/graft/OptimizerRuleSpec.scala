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

  test("unequal lengths still yield NULL (zip_with semantics preserved)") {
    FuseDotProductRegistrar.ensure(spark)
    val a = transform(sequence(lit(1), lit(4)), i => i.cast("double"))
    val b = transform(sequence(lit(1), lit(6)), i => i.cast("double"))
    val out = spark.range(1).select(Similarity.dot(a, b).as("d"))
      .collect().head
    assert(out.isNullAt(0), s"expected NULL for unequal lengths, got $out")
  }
}
