package graft.util

import org.apache.spark.sql.SparkSession

/** Data-derived write parallelism.
  *
  * A hand-pinned bucket/partition count in a write path is a latent
  * scale bug: the constant that lays out sf0.1 nicely makes each
  * write task sort 100× the bytes at sf10 (measured before this
  * helper existed: `src_bucketed_join` spilled 5.6 GB and
  * `src_zorder_export` 2.7 GB at the 8-way layouts that are
  * spill-free on driver testdata). Deriving the unit count from the
  * SOURCE table's on-disk footprint keeps per-task sort volume
  * roughly constant at every scale — the property that still holds on
  * a 1000-executor cluster reading 100 TB — while the floor keeps
  * small fixtures on their historical layout, so oracled results and
  * past layout-sensitive measurements stay comparable.
  */
object Sizing {

  /** Write-side unit count (buckets / range partitions) for
    * `dir/name.parquet`: one unit per `targetBytes` of on-disk source
    * (compressed parquet bytes — the in-memory sort working set is a
    * few× larger, still well inside task memory), floored at
    * `minUnits`. Deterministic given the data: derived from the
    * table's byte size, never from cores or session state, so the
    * layout a query writes (and any oracle that reads it back) is
    * reproducible across hosts and cluster shapes.
    */
  def writeUnits(s: SparkSession, dir: String, name: String,
      targetBytes: Long = 64L << 20, minUnits: Int = 8): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    math.max(minUnits, ((bytes + targetBytes - 1) / targetBytes).toInt)
  }
}
