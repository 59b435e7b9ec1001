package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry for development (not part of the driver
  * contract). Usage: runMain graft.tools.Profile <sfDir> <what>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "minhash"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    what match {
      case "minhash" =>
        import org.apache.spark.sql.functions._
        val docs = graft.util.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        time("shingles only") {
          docs.select(graft.ops.Dedup.shingles(col("text")).as("sh"))
            .agg(sum(size(col("sh")))).first()
        }
        time("signatures") {
          graft.ops.Dedup.minhashSignatures(docs)
            .agg(sum(size(col("sig")))).first()
        }
        time("full lsh") {
          graft.ops.Dedup.minhashLsh(spark, sfDir).count()
        }
      case "bloom" =>
        import org.apache.spark.sql.functions._
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val li = graft.util.Tables.lineitem(spark, sfDir)
        val sel = graft.util.Tables.orders(spark, sfDir)
          .filter(col("o_orderpriority") === "1-URGENT"
            && col("o_totalprice") > 80000.0)
        val q = li.join(sel, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        q.explain(true)
      case "warm" =>
        val name = args(2)
        // absorb first-query session warm-up (codegen infra, rule
        // init) so round 1 isolates THIS query's cold cost
        time("session warm-up") {
          graft.util.Tables.documents(spark, sfDir).count()
          graft.util.Tables.lineitem(spark, sfDir)
            .groupBy("l_returnflag").count().count()
        }
        for (round <- 1 to 3) {
          time(s"$name round $round") {
            graft.SparkEntry.queries(name)(spark, sfDir).count()
          }
        }
      case "als" =>
        import org.apache.spark.ml.recommendation.ALS
        val ratings = graft.recommend.AlsPipeline.ratings(spark)
        ratings.count()
        for (blocks <- Seq(10, 4, 2)) {
          time(s"fit rank4 blocks=$blocks") {
            new ALS().setUserCol("userId").setItemCol("movieId")
              .setRatingCol("rating").setRank(4).setMaxIter(10)
              .setRegParam(0.1).setSeed(5).setColdStartStrategy("drop")
              .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
              .fit(ratings)
          }
        }
      case "explain" =>
        for (name <- Seq("rel_topk", "rel_groupby_agg", "rel_join_multi_agg",
          "rel_filter", "sim_knn_brute", "events_tumbling_window")) {
          println(s"========== $name ==========")
          graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        }
    }
    spark.stop()
  }
}
