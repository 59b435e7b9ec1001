package graft

import graft.recommend.AlsPipeline

/** Golden-tolerance anchors from the reference's published numbers
  * (BASELINE.md; recommender.py inline outputs). ml-ALS vs legacy
  * mllib-ALS differ in init RNG, so model-quality goldens hold to
  * tolerance, cardinality/parse goldens exactly (SURVEY.md §5).
  *
  * Trains rank-4 once (memoized); the full grid is exercised by the
  * driver through SparkEntry.queries, not re-run here.
  */
class AlsPipelineSpec extends SparkTestBase {

  import spark.implicits._

  test("ratings parse: 100,004 rows, golden head") {
    val r = AlsPipeline.ratings(spark)
    assert(r.count() === 100004L)
    val head = r.as[(Int, Int, Double)].head(3).toSeq
    assert(head === Seq((1, 31, 2.5), (1, 1029, 3.0), (1, 1061, 3.0)))
  }

  test("movies naive parse: 9,125 rows, golden head, comma-title truncation") {
    val m = AlsPipeline.moviesNaive(spark)
    assert(m.count() === 9125L)
    val byId = m.as[(Int, String)].collect().toMap
    assert(byId(1) === "Toy Story (1995)")
    assert(byId(2) === "Jumanji (1995)")
    // 164979,"Women of '69, Unboxed",Documentary → truncates at comma
    assert(byId(164979) === "\"Women of '69")
  }

  test("random split is 3/1/1-ish and partitions the data") {
    val (tr, va, te) = AlsPipeline.splits(spark)
    val (n1, n2, n3) = (tr.count(), va.count(), te.count())
    assert(n1 + n2 + n3 === 100004L)
    assert(n1 > 55000 && n1 < 65000, s"train=$n1")
    assert(n2 > 17000 && n2 < 23000, s"val=$n2")
  }

  test("rank-4 validation RMSE lands in the golden band") {
    val (tr, va, _) = AlsPipeline.splits(spark)
    val e = AlsPipeline.rmse(AlsPipeline.fit(tr, 4), va)
    // reference: 0.9459 (mllib); ml-ALS drifts ±0.02
    assert(e > 0.92 && e < 0.97, s"rank-4 val RMSE $e")
  }

  test("vector-fidelity MinMaxScaler equals the scalar rescale (SURVEY op 24)") {
    import org.apache.spark.ml.feature.MinMaxScaler
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.functions._
    val df = Seq(2.0, 7.5, 3.25, 9.0, 4.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "p")
      .withColumn("pv", array_to_vector(array(col("p"))))
    val scaled = new MinMaxScaler().setMin(1.0).setMax(5.0)
      .setInputCol("pv").setOutputCol("sv")
      .fit(df).transform(df)
      .select($"id",
        element_at(org.apache.spark.ml.functions.vector_to_array($"sv"), 1)
          .as("vecScaled"))
    val mm = df.agg(min($"p").as("lo"), max($"p").as("hi"))
    val scalar = df.crossJoin(mm)
      .select($"id", (($"p" - $"lo") / ($"hi" - $"lo") * 4.0 + 1.0).as("s"))
    val joined = scaled.join(scalar, "id")
      .select($"vecScaled", $"s").as[(Double, Double)].collect()
    joined.foreach { case (v, s) => assert(math.abs(v - s) < 1e-9) }
  }

  test("grid pins best rank 4 and per-rank RMSE bands; test RMSE in the 0.9410 band") {
    // reference goldens: val RMSE 0.9459 / 0.9502 / 0.9494 for ranks
    // 4 / 8 / 12 and best rank 4 (recommender.py:81-86); test RMSE
    // 0.94100 for the retrained best model (recommender.py:100).
    // ml-ALS init RNG differs from legacy mllib → ±0.02 tolerance.
    val grid = AlsPipeline.gridRmse(spark)
      .as[(Int, Double, Boolean)].collect().sortBy(_._1)
    assert(grid.map(_._1).toSeq === Seq(4, 8, 12))
    val bands = Map(4 -> 0.9459, 8 -> 0.9502, 12 -> 0.9494)
    grid.foreach { case (rank, rmse, _) =>
      assert(math.abs(rmse - bands(rank)) < 0.02,
        s"rank-$rank val RMSE $rmse vs golden ${bands(rank)}")
    }
    assert(grid.filter(_._3).map(_._1).toSeq === Seq(4),
      "is_best must land on rank 4 alone")
    val (bestRank, testRmse) = AlsPipeline.testRmse(spark)
      .as[(Int, Double)].head()
    assert(bestRank === 4)
    assert(math.abs(testRmse - 0.94100) < 0.02,
      s"test RMSE $testRmse vs golden 0.94100")
  }

  test("batch top-5 per user: exact k, rank order, no rated movie resurfaces") {
    val rows = AlsPipeline.allUsersTopK(spark)
      .as[(Int, Int, Double)].collect()
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    assert(byUser.values.forall(_.length === 5), "every user gets exactly 5")
    // within a user: scores non-increasing, movieId ascending on ties
    byUser.values.foreach { recs =>
      recs.sliding(2).foreach {
        case Array((_, m1, s1), (_, m2, s2)) =>
          assert(s1 > s2 || (s1 === s2 && m1 < m2), s"order violated: $recs")
        case _ =>
      }
    }
    // candidates were the UNRATED movies — a rated one leaking back in
    // means the anti-join broke
    val rated = AlsPipeline.ratings(spark)
      .as[(Int, Int, Double)].collect()
      .map { case (u, m, _) => (u, m) }.toSet
    assert(rows.forall { case (u, m, _) => !rated((u, m)) })
  }

  test("new-user pipeline: prediction count in the 9,057 band, scaled range [1,5]") {
    val top = AlsPipeline.newUserTop10(spark).collect()
    assert(top.length === 10)
    // raw scores can exceed 5 (README golden); scaled max is exactly 5
    assert(top.head.getDouble(3) === 5.0)
    assert(top.forall(r => r.getDouble(3) >= 1.0 && r.getDouble(3) <= 5.0))
    val n = AlsPipeline.newUserPredCount(spark).first().getLong(0)
    assert(n > 8900 && n < 9125, s"new-user prediction count $n")
  }
}
