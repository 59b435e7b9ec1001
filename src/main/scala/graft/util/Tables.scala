package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables
  * (`/root/testdata/sf*`, see TESTDATA.md). All engine queries funnel
  * through here so scan-level concerns (schema quirks, session confs)
  * live in one place.
  */
object Tables {

  /** Parquet scan for a testdata table. Column pruning + predicate
    * pushdown happen in the callers' plans (verified via
    * `.explain("formatted")` — PushedFilters/ReadSchema).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS);
    * Spark 4.1.2 throws [PARQUET_TYPE_ILLEGAL] unless
    * `spark.sql.legacy.parquet.nanosAsLong=true`, after which `ts`
    * reads as BIGINT epoch-nanoseconds (see SURVEY.md §4). The conf is
    * set at runtime because the driver's Verify/Bench sessions don't
    * set it at build time (verified working on 4.1.2).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }
}
