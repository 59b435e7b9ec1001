package graft

import org.apache.spark.sql.functions._

/** Null-safety and planner-visibility taxonomy for Scala UDFs — the
  * behavioral contract a library user needs before reaching past
  * `org.apache.spark.sql.functions`:
  *
  *  - primitive-typed params: Spark short-circuits null inputs to a
  *    null result WITHOUT invoking the function (no boxed-null NPE,
  *    but also no chance to substitute a default);
  *  - Option-typed params: the function is invoked and owns the null
  *    decision;
  *  - output nullability: inferred from input nullability and return
  *    type; the primitive-param short-circuit wrapper trumps an
  *    `asNonNullable` declaration;
  *  - UDF predicates are opaque to the optimizer: they do NOT reach
  *    the parquet scan's pushed filters, unlike native Column
  *    predicates — the concrete cost of a UDF in the hot path.
  */
class UdfTaxonomySpec extends SparkTestBase {

  import spark.implicits._

  test("primitive-typed UDF short-circuits null input to null, uncalled") {
    var calls = 0
    val inc = udf { (x: Long) => calls += 1; x + 1 }
    val out = Seq[java.lang.Long](Long.box(1L), null, Long.box(3L))
      .toDF("x").select(inc($"x").as("y")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(out === Seq(Some(2L), None, Some(4L)))
    assert(calls === 2, "the UDF body must not run on the null row")
  }

  test("Option-typed UDF receives the null and owns the default") {
    val inc = udf((x: Option[Long]) => x.map(_ + 1).getOrElse(-1L))
    val out = Seq[java.lang.Long](Long.box(1L), null, Long.box(3L))
      .toDF("x").select(inc($"x").as("y"))
      .as[Long].collect().toSeq
    assert(out === Seq(2L, -1L, 4L))
  }

  test("output nullability tracks input nullability; asNonNullable overrides") {
    val f = udf((x: Long) => x + 1)
    val nonNullIn = Seq(1L).toDF("x")
    assert(!nonNullIn.select(f($"x").as("y")).schema("y").nullable,
      "non-nullable input cannot short-circuit, so output is non-nullable")
    val nullableIn = Seq[java.lang.Long](Long.box(1L)).toDF("x")
    assert(nullableIn.select(f($"x").as("y")).schema("y").nullable,
      "nullable input can short-circuit to null, so output is nullable")
    assert(nullableIn.select(f.asNonNullable()($"x").as("y"))
      .schema("y").nullable,
      "the primitive-param short-circuit wrapper TRUMPS asNonNullable")
    // Option params install no short-circuit wrapper, and a primitive
    // return type can never be null — non-nullable WITHOUT any
    // asNonNullable declaration
    val g = udf((x: Option[Long]) => x.map(_ + 1).getOrElse(-1L))
    assert(!nullableIn.select(g($"x").as("y")).schema("y").nullable,
      "Option param + primitive return is statically null-free")
  }

  test("UDF predicates don't push to the scan; native predicates do") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val native = li.filter($"l_quantity" > 30)
      .queryExecution.executedPlan.toString()
    assert(native.contains("GreaterThan(l_quantity"),
      s"native predicate should reach PushedFilters:\n$native")
    val isBig = udf((q: Double) => q > 30)
    val opaque = li.filter(isBig($"l_quantity"))
      .queryExecution.executedPlan.toString()
    assert(!opaque.contains("GreaterThan(l_quantity"),
      s"UDF predicate unexpectedly pushed:\n$opaque")
  }
}
