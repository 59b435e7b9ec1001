package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

class CurationSpec extends SparkTestBase {

  import spark.implicits._

  test("hash split partitions the corpus exactly, content-keyed") {
    val split = Curation.hashSplit(spark, sf)
    val total = split.agg(sum($"n_docs")).as[Long].head()
    assert(total === spark.read.parquet(s"$sf/documents.parquet").count())
    // identical text must land in the same split: bucket is a pure
    // function of content, so distinct(text -> split) is 1:1
    val perText = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("bucket",
        conv(substring(md5($"text"), 1, 4), 16, 10).cast("long") % 10)
      .groupBy($"text").agg(countDistinct($"bucket").as("nb"))
    assert(perText.filter($"nb" > 1).count() === 0)
  }

  test("contamination: benchmark docs fully contaminate themselves") {
    // a doc that IS a benchmark shingle-subset would score 1.0; all
    // scores are valid ratios and hits never exceed the shingle count
    val c = Curation.contamination(spark, sf).collect()
    assert(c.nonEmpty)
    assert(c.forall { r =>
      val ratio = r.getDouble(2)
      ratio > 0.0 && ratio <= 1.0
    })
  }

  test("curation summary: kept never exceeds total, ratio consistent") {
    val rows = Curation.curationSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getLong(1)
      val kept = r.getLong(2)
      assert(kept <= total)
      assert(math.abs(r.getDouble(3) - kept.toDouble / total) < 1e-3)
    }
  }
}
