package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Pins the three claims GraftColumnBridge.truncateLineage makes:
  * data unchanged, logical plan collapsed to a leaf (the iterative-
  * loop OOM class from DeepComponentSpec cannot re-grow), and the
  * wrapped plan's hash partitioning preserved so a same-key
  * aggregation downstream plans NO new exchange.
  */
class LineageTruncationSpec extends SparkTestBase {

  import spark.implicits._

  test("rows and schema survive, plan collapses to a leaf") {
    val src = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("k"))
      .persist()
    try {
      val t = GraftColumnBridge.truncateLineage(src)
      assert(t.schema === src.schema)
      assert(t.as[(Long, Long)].collect().sortBy(_._1)
        === src.as[(Long, Long)].collect().sortBy(_._1))
      // leaf: the analyzed plan of the wrapper has no children
      assert(GraftColumnBridge.logicalPlan(t).children.isEmpty)
    } finally { src.unpersist(): Unit }
  }

  test("self-join loop keeps the plan size constant per iteration") {
    var m = spark.range(0, 64)
      .select(col("id").as("node"), (col("id") / 2).cast("long").as("label"))
    val sizes = (1 to 6).map { _ =>
      val m2 = m.as("x")
        .join(m.as("y"), col("x.label") === col("y.node"), "left_outer")
        .select(col("x.node").as("node"),
          coalesce(col("y.label"), col("x.label")).as("label"))
        .persist()
      m2.count() // materialize the cache the wrapper will scan
      m = GraftColumnBridge.truncateLineage(m2)
      GraftColumnBridge.logicalPlan(m).collect { case p => p }.size
    }
    // without truncation node count doubles per iteration (2^k leaf
    // copies); with it every iteration's plan is the same single leaf
    assert(sizes.distinct.size === 1, s"plan sizes grew: $sizes")
    assert(sizes.head <= 2)
  }

  test("hash partitioning survives: same-key agg adds no exchange") {
    val parted = spark.range(0, 512)
      .select((col("id") % 13).as("k"), col("id").as("v"))
      .repartition(4, col("k"))
      .persist()
    parted.count()
    val agg = GraftColumnBridge.truncateLineage(parted)
      .groupBy(col("k")).agg(sum(col("v")).as("s"))
    agg.collect()
    val exchanges = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    try assert(exchanges.isEmpty,
      s"expected no exchange over the preserved partitioning, got: " +
        exchanges.mkString(", "))
    finally { parted.unpersist(): Unit }
  }
}
