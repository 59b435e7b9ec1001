package graft.tools

import org.apache.spark.sql.SparkSession

/** One-command absorb/reject diagnosis for a (re)generated testdata
  * dir — the first thing to run when the driver regenerates
  * `/root/testdata` (it has drifted twice: INT64-nanos → TIMESTAMP_NTZ
  * in round 8; this tool exists so the NEXT drift costs minutes, not
  * the first hour of a round).
  *
  * Usage: runMain graft.tools.DriftCheck [sfDir]
  *
  * Prints every contract violation (graft.util.SchemaContract — the
  * same expectations SchemaContractSpec asserts) and one final
  * verdict line:
  *   DRIFTCHECK ABSORB — engine reads this dir correctly as-is; any
  *     encoding deviation is handled inside Tables.normalizeEventTime.
  *   DRIFTCHECK REJECT — at least one table/column the engine cannot
  *     absorb; the findings name each one. Teach the scan layer
  *     (graft.util.Tables), never the query sites.
  * Exit code 0 = absorb, 1 = reject (scriptable).
  */
object DriftCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-driftcheck")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (findings, absorbed) = graft.util.SchemaContract.check(spark, sfDir)
    findings.foreach(f => println(s"[driftcheck] DRIFT: $f"))
    if (absorbed)
      println(s"DRIFTCHECK ABSORB $sfDir — schema + canonical event-time " +
        "contract hold; engine reads this dir as-is")
    else
      println(s"DRIFTCHECK REJECT $sfDir — ${findings.size} violation(s) " +
        "above; absorb at the scan layer (graft.util.Tables / " +
        "normalizeEventTime), not at query sites")
    spark.stop()
    if (!absorbed) sys.exit(1)
  }
}
