package graft

import org.apache.spark.sql.functions._

/** Both lake layouts a table can present — a plain single file
  * (driver testdata) and a directory of part files (multi-file scale
  * fixture; any real lake) — must stream identically through
  * Tables.streamTable. The directory layout is the one the streaming
  * source silently DROPPED under the old parent-dir glob
  * (pathGlobFilter matches leaf names only), which forced ScaleFixture
  * into single coalesced files and capped batch scan parallelism at
  * one task per 128 MB of file bytes.
  */
class StreamLayoutSpec extends SparkTestBase {

  private def drain(src: org.apache.spark.sql.DataFrame,
      name: String): Seq[(Long, Long)] = {
    val q = src.groupBy((col("doc_id") % 3).as("k"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation",
        graft.util.ScratchIndex.dir(s"ck_layout_$name").toString)
      .format("memory").queryName(s"layout_$name").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(s"layout_$name").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  test("file-shaped and directory-shaped tables stream identically") {
    val base = graft.util.ScratchIndex.dir("layout_fixture").toString
    val docs = spark.range(0, 97)
      .select(col("id").as("doc_id"),
        concat(lit("text "), col("id")).as("text"))
    // single-file layout: one part file renamed to <name>.parquet
    docs.coalesce(1).write.mode("overwrite").parquet(s"$base/tmp")
    val part = new java.io.File(s"$base/tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$base/single").mkdirs()
    java.nio.file.Files.move(part.toPath,
      new java.io.File(s"$base/single/docs.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // directory layout: 3 part files under <name>.parquet/
    docs.repartition(3).write.mode("overwrite")
      .parquet(s"$base/multi/docs.parquet")

    val schema = docs.schema
    val single = drain(
      graft.util.Tables.streamTable(spark, s"$base/single", "docs", schema),
      "single")
    val multi = drain(
      graft.util.Tables.streamTable(spark, s"$base/multi", "docs", schema),
      "multi")
    assert(single.map(_._2).sum == 97, s"single-file drain lost rows: $single")
    assert(single == multi,
      s"layouts diverged: single=$single multi=$multi")
  }
}
