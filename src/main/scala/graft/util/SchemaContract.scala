package graft.util

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The engine's expectations of the driver-generated testdata, as
  * DATA — one place both the schema-tripwire spec
  * (SchemaContractSpec) and the command-line drift checker
  * (tools/DriftCheck) evaluate, so the absorb/reject analysis after
  * a testdata regeneration is a one-command diagnosis instead of the
  * first hour of a round.
  *
  * Two layers, mirroring how the engine reads:
  *  - RAW: what we believe the generator currently writes. `events.ts`
  *    is special — any encoding in [[absorbableTs]] is fine because
  *    [[Tables.normalizeEventTime]] absorbs it at the scan.
  *  - CANONICAL: what queries actually consume after normalization
  *    (`ts_us`/`event_time` with plausible epoch-µs values). If RAW
  *    drifts but CANONICAL holds, the drift is ABSORBED and every
  *    query is safe with zero code changes; if CANONICAL breaks, the
  *    drift is REJECTED and normalizeEventTime needs teaching.
  */
object SchemaContract {

  /** One contract violation: which table.column, what the engine
    * expects, what the data actually has. */
  case class Finding(table: String, column: String,
      expected: String, got: String) {
    override def toString = s"$table.$column: expected $expected, got $got"
  }

  /** `events.ts` encodings the scan normalization absorbs. */
  val absorbableTs: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  /** Raw column-type expectations per table (a subset per table: the
    * columns queries and oracles depend on). */
  val rawExpectations: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderstatus" -> StringType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_shipdate" -> TimestampNTZType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "events" -> Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))

  /** Plausible epoch-µs bounds for canonical `ts_us` (2001..2100) —
    * catches a wrong-unit normalization branch, not just a
    * wrong-type one. */
  val minPlausibleUs: Long = 978307200000000L
  val maxPlausibleUs: Long = 4102444800000000L

  private def fields(df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  /** Raw-layer findings over every table in `dir`. */
  def checkRaw(spark: SparkSession, dir: String): Seq[Finding] = {
    val typed = rawExpectations.toSeq.sortBy(_._1).flatMap {
      case (table, cols) =>
        try {
          val got = fields(
            if (table == "events") Tables.eventsRaw(spark, dir)
            else Tables.t(spark, dir, table))
          cols.collect {
            case (name, dt) if !got.get(name).contains(dt) =>
              Finding(table, name, dt.simpleString,
                got.get(name).map(_.simpleString).getOrElse("MISSING"))
          }
        } catch {
          case NonFatal(e) =>
            Seq(Finding(table, "*", "readable parquet", e.getMessage))
        }
    }
    val ts = try {
      val got = fields(Tables.eventsRaw(spark, dir)).get("ts")
      if (got.exists(absorbableTs.contains)) Nil
      else Seq(Finding("events", "ts",
        s"one of ${absorbableTs.map(_.simpleString).mkString("/")}",
        got.map(_.simpleString).getOrElse("MISSING")))
    } catch { case NonFatal(_) => Nil /* already reported above */ }
    val emb = try {
      fields(Tables.embeddings(spark, dir)).get("embedding") match {
        case Some(ArrayType(FloatType, _)) => Nil
        case other => Seq(Finding("embeddings", "embedding",
          "array<float>", other.map(_.simpleString).getOrElse("MISSING")))
      }
    } catch {
      case NonFatal(e) => Seq(Finding("embeddings", "*", "readable parquet",
        e.getMessage))
    }
    typed ++ ts ++ emb
  }

  /** Canonical-layer findings: the normalized `events` contract every
    * query consumes. Runs the scan (including the per-row unit probe
    * in normalizeEventTime), so a silent-1000x INT64 unit drift
    * surfaces here too. */
  def checkCanonicalEvents(spark: SparkSession, dir: String): Seq[Finding] =
    try {
      val ev = Tables.events(spark, dir)
      val got = fields(ev)
      val shape =
        (if (got.contains("ts"))
           Seq(Finding("events", "ts",
             "DROPPED after normalization", "still present")) else Nil) ++
        (if (!got.get("ts_us").contains(LongType))
           Seq(Finding("events", "ts_us", "bigint",
             got.get("ts_us").map(_.simpleString).getOrElse("MISSING")))
         else Nil) ++
        (if (!got.get("event_time").contains(TimestampType))
           Seq(Finding("events", "event_time", "timestamp",
             got.get("event_time").map(_.simpleString).getOrElse("MISSING")))
         else Nil)
      if (shape.nonEmpty) shape
      else {
        import org.apache.spark.sql.functions.{min => smin, max => smax}
        val r = ev.agg(smin("ts_us"), smax("ts_us")).head()
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        if (lo > minPlausibleUs && hi < maxPlausibleUs) Nil
        else Seq(Finding("events", "ts_us",
          s"epoch-µs in ($minPlausibleUs, $maxPlausibleUs)", s"[$lo, $hi]"))
      }
    } catch {
      case NonFatal(e) =>
        Seq(Finding("events", "ts", "normalizable encoding",
          s"normalization failed: ${e.getMessage}"))
    }

  /** Full verdict for one sf dir. `absorbed` = every query is safe as
    * the engine stands: the canonical layer holds AND the only raw
    * deviations (if any) are events.ts encodings normalization
    * handles — which checkRaw only emits as findings when they are
    * NOT absorbable, so absorbed reduces to "no findings at all". */
  def check(spark: SparkSession, dir: String): (Seq[Finding], Boolean) = {
    val raw = checkRaw(spark, dir)
    val canonical = checkCanonicalEvents(spark, dir)
    (raw ++ canonical, raw.isEmpty && canonical.isEmpty)
  }
}
