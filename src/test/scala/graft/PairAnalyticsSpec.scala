package graft

import org.apache.spark.sql.functions._
import graft.ops.{Events, Graph, Relational3}

/** The round-13 pair-statistics family: common-neighbor link features
  * (Graph.commonNeighbors), market-basket association rules
  * (Relational3.basketLift), and the event-type transition matrix
  * (Events.transitions). Each is cross-checked against an independent
  * plain-Scala reimplementation over the collected sf0.001 corpus, and
  * the structural invariants (cn ≤ min degree, confidence ≤ 1,
  * row-stochastic transition rows) are pinned.
  */
class PairAnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  /** Per-order distinct item sets at sf0.001 — the shared input of
    * both pair queries (spec-side only; the engine never collects).
    */
  private lazy val baskets: Map[Long, Seq[Long]] =
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.toSeq).toMap

  /** Undirected co-purchase adjacency derived from [[baskets]]. */
  private lazy val adj: Map[Long, Set[Long]] = {
    val m = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    for (items <- baskets.values; Seq(a, b) <- items.combinations(2)) {
      m(a) += b; m(b) += a
    }
    m.toMap
  }

  test("common neighbors matches a plain-Scala neighborhood intersect") {
    // adj.toSeq first: a for-comprehension over the Map itself would
    // rebuild a Map from the yielded pairs and collapse every edge
    // sharing a left endpoint
    val edges = for ((v, ns) <- adj.toSeq; w <- ns.toSeq if v < w)
      yield (v, w)
    val want = edges.map { case (a, b) =>
      val cn = (adj(a) & adj(b)).size.toLong
      val (da, db) = (adj(a).size.toLong, adj(b).size.toLong)
      (a, b, cn, da, db, cn.toDouble / (da + db - cn).toDouble)
    }.sortBy { case (a, b, cn, _, _, _) => (-cn, a, b) }.take(100)
    val got = Graph.commonNeighbors(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // exact equality on the floats too: both sides are two exact
    // integers into one IEEE division
    assert(got === want)
    // non-vacuity: the corpus has triangle-supported edges, so the
    // top-100 must lead with cn > 0 (a trivially-zero column would
    // pass the hash but test nothing)
    assert(got.head._3 > 0L)
    // structural bound per row: cn ≤ min(deg_a, deg_b)
    got.foreach { case (_, _, cn, da, db, j) =>
      assert(cn <= math.min(da, db) && j >= 0.0 && j <= 1.0)
    }
  }

  test("basket lift matches a plain-Scala support count") {
    val nOrders = baskets.size.toLong
    val support = baskets.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCounts = baskets.values
      .flatMap(_.combinations(2).map { case Seq(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = pairCounts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(100)
    val want = top.map { case ((a, b), nab) =>
      val (na, nb) = (support(a), support(b))
      (a, b, nab, na, nb, nab.toDouble / na.toDouble,
        (nOrders * nab).toDouble / (na * nb).toDouble)
    }
    val got = Relational3.basketLift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === want)
    // invariants: support bounds and confidence ≤ 1; lift positive
    got.foreach { case (_, _, nab, na, nb, conf, lift) =>
      assert(nab <= math.min(na, nb) && conf > 0.0 && conf <= 1.0
        && lift > 0.0)
    }
    // the pair top-k is a per-partition-heap TakeOrderedAndProject,
    // not a global sort of the pair relation
    val plan = Relational3.basketLift(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("transition matrix matches a plain-Scala sequence walk") {
    // derive the expected sequences from Tables.events — the repo's
    // single ts-encoding absorption point — so a generator drift back
    // to a legacy encoding fails loudly in normalizeEventTime instead
    // of silently reordering this spec's expectation (ADVICE r13)
    val seqs = graft.util.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts_us", $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2)).map(_._4).toSeq)
    val counts = seqs.values
      .flatMap(s => s.zip(s.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val want = counts.toSeq.map { case ((p, c), n) =>
      (p, c, n, n.toDouble / fromTotals(p).toDouble)
    }.sortBy(r => (r._1, r._2))
    val got = Events.transitions(spark, sf)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === want)
    // row-stochastic: each prev row's probabilities sum to 1
    got.groupBy(_._1).values.foreach { row =>
      assert(math.abs(row.map(_._4).sum - 1.0) < 1e-12)
    }
    // non-vacuity: more than one prev state and at least one
    // off-diagonal transition observed
    assert(got.map(_._1).distinct.size > 1)
    assert(got.exists(r => r._1 != r._2))
  }
}
