package graft

import graft.sources.Sources

class SourcesSpec extends SparkTestBase {

  test("csv round-trip preserves the relation") {
    val back = Sources.csvRoundtrip(spark, sf)
    val orig = spark.read.parquet(s"$sf/orders.parquet")
    assert(back.count() === orig.count())
  }

  test("partitioned read prunes to one partition directory") {
    val df = Sources.partitionedWrite(spark, sf)
    assert(df.count() > 0)
    // the scan must carry a partition filter on event_type, leaving no
    // data filter (pruning happened at planning, not at runtime)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filters in:\n$scan")
  }

  test("bucketed join plans with no shuffle exchange") {
    val df = Sources.bucketedJoin(spark, sf)
    assert(df.count() > 0)
    val inner = {
      // strip the final presentation orderBy: look at the join subtree
      val joined = Sources.bucketedJoin(spark, sf)
        .queryExecution.executedPlan.toString()
      joined
    }
    val joinPart = inner.split("AdaptiveSparkPlan|== Final Plan ==").last
    // the bucketed join itself must not re-shuffle on the join key:
    // the only allowed exchange is the final global orderBy's range
    // repartition
    val exchanges = "Exchange (hashpartitioning)".r
      .findAllIn(joinPart).length
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"unexpected hash exchange in bucketed join plan:\n$joinPart")
  }
}
