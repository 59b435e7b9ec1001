package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped SQL-conf overrides with exact restore.
  *
  * Operators that need non-default session confs (AQE skew knobs,
  * broadcast thresholds, runtime bloom filters) must not leak them
  * into the shared session: the bench sweep and the test suite run
  * hundreds of queries on one `SparkSession`, and a leaked AQE knob
  * silently changes planning for every query that follows — results
  * become order-dependent. `withConfs` snapshots each touched key
  * with `getOption` before setting it and restores (or unsets, if the
  * key had no prior value) in a `finally`, so every key it touches is
  * guaranteed restored even when the body throws.
  */
object Confs {

  def withConfs[A](s: SparkSession)(kvs: (String, String)*)(body: => A): A = {
    val conf = s.conf
    val saved: Seq[(String, Option[String])] =
      kvs.map { case (k, _) => k -> conf.getOption(k) }
    kvs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
