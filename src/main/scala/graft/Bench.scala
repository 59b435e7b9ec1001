package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * `value`/`queries` are COLD first-run times (includes Catalyst
  * planning + whole-stage-codegen compilation — the driver-comparable
  * number). `warm_total`/`queries_warm` time an immediate second run
  * of the same plan: steady-state cost with codegen compiled and ALS
  * models memoized, i.e. what a long-lived session/cluster pays.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }

    val cold = SparkEntry.queries.map { case (name, fn) =>
      name -> timeOne(fn)
    }
    val warm = SparkEntry.queries.map { case (name, fn) =>
      name -> timeOne(fn)
    }

    def jmap(m: Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val total = cold.values.sum
    val warmTotal = warm.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":${jmap(cold)},"warm_total":$warmTotal,""" +
      s""""queries_warm":${jmap(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
