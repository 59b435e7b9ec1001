package graft

import org.scalatest.funsuite.AnyFunSuite

/** Door guard for the cross-engine float-tie taxonomy
  * (ops/Relational.scala:14-40, "case 2"): RATIOS and AVERAGES of
  * discrete data must NOT be rounded — their true values land on real
  * decimal .5 ties where Spark's HALF_UP and DuckDB's scale-multiply
  * rounding split on bit-identical doubles (observed live twice in
  * round 9: 58.47375 → 58.4737 vs 58.4738). The fix shape is an exact
  * integer numerator + ONE identically-shaped division on both sides.
  *
  * This class of bug was fixed at five sites across rounds 9-10
  * (avg_disc x2, funnel latency, quality-model avg_score, the
  * weighted-mean UDAF); this spec stops it re-entering: every oracle
  * SQL string is scanned for `round(` whose balanced argument contains
  * an aggregate ratio/average shape. Genuinely continuous aggregates
  * (taxonomy case 3 — sqrt/log/stddev products, varying-denominator
  * rationals, raw embedding doubles) are EXEMPT, but only via the
  * explicit allowlist below, each entry carrying its justification —
  * a new query with the hazard shape fails here until its author
  * either converts to the exact-numerator form or argues continuity.
  */
class FloatTieGuardSpec extends AnyFunSuite {

  /** Queries whose rounded aggregate is taxonomy case 3 (continuous —
    * tie probability zero), with the continuity argument. */
  private val continuousAllowlist: Map[String, String] = Map(
    "rel_global_agg" ->
      ("sqrt(avg(squared error)) — the sqrt makes the value " +
        "irrational/continuous; round(.,4) absorbs ulp drift"),
    "text_lang_id" ->
      ("avg of per-doc stopword densities k_i/m_i with VARYING " +
        "denominators m_i — the mean is a rational with huge " +
        "denominator, not on any fixed decimal grid; landing within " +
        "float-drift (~1e-12) of a 1e-4 half-tie has ~1e-7 " +
        "probability, vs ~1e-1 for fixed-grid data"),
    "rel_try_funcs" ->
      ("sum(price / (partkey%3 ∈ {1,2})) — every term is a multiple " +
        "of 0.005 (2-decimal price over divisors 1,2), so the TRUE " +
        "sum sits exactly ON the 3-decimal grid; round(.,4) is " +
        "strictly finer than the grid = taxonomy case 1 (on-grid " +
        "snap), and the ~1e7 magnitude leaves 1e5x headroom"),
    "dedup_semantic" ->
      ("avg over raw embedding components and sqrt-normalized " +
        "cosines — continuous doubles, tie probability zero"),
    "sim_centroid_classify" ->
      ("same centroid/cosine shape as dedup_semantic — continuous"),
    "sim_embed_stats" ->
      ("avg/min/max of vector L2 norms (sqrt of sum of squares) — " +
        "continuous"),
    "sim_quantize_int8" ->
      ("per-row quantization round(x/scale) and sqrt-based rmse/scale " +
        "outputs over continuous embedding doubles"))

  /** Substrings that mark a rounded aggregate as the hazard shape:
    * an average, or a sum-ratio (sum(...)/...). */
  private def hazardous(arg: String): Boolean = {
    val a = arg.toLowerCase
    a.contains("avg(") || (a.contains("sum(") && a.contains("/"))
  }

  /** Every balanced-paren argument of a `round(` call in `sql`. */
  private def roundArgs(sql: String): Seq[String] = {
    val s = sql.toLowerCase
    val out = Seq.newBuilder[String]
    var i = s.indexOf("round(")
    while (i >= 0) {
      var depth = 1
      var j = i + "round(".length
      val start = j
      while (j < s.length && depth > 0) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _   =>
        }
        j += 1
      }
      out += s.substring(start, j - 1)
      i = s.indexOf("round(", j)
    }
    out.result()
  }

  test("no oracle rounds an aggregate average or sum-ratio (taxonomy case 2)") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (name, sql)
          if !continuousAllowlist.contains(name)
            && roundArgs(sql).exists(hazardous) =>
        name
    }
    assert(violations.isEmpty,
      s"""oracle SQL for ${violations.mkString(", ")} rounds an aggregate
         |average or sum-ratio — the cross-engine .5-tie hazard shape
         |(ops/Relational.scala taxonomy case 2). Convert to the exact
         |integer-numerator form (sum(CAST(round(x*scale) AS BIGINT)) /
         |(scale.0 * count(*)), and the same shape on the Spark side),
         |or, if the aggregated data is genuinely continuous, add the
         |query to continuousAllowlist with the continuity argument.
         |""".stripMargin)
  }

  test("allowlist entries name real queries (no stale exemptions)") {
    val stale = continuousAllowlist.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty,
      s"allowlisted queries no longer exist in oracleSql: $stale")
  }
}
