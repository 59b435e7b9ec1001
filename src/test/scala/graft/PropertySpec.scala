package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tier (SURVEY.md §5): operator laws over generated
  * data, executed through the real engine (small local plans).
  * Uses scalacheck directly (Prop.forAll + Test.check) — the
  * scalatestplus bridge isn't in the offline cache.
  */
class PropertySpec extends SparkTestBase {

  import spark.implicits._
  import Prop.propBoolean

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val doubles: Gen[List[Double]] =
    Gen.listOfN(40, Gen.choose(-1e6, 1e6))

  test("min-max scaling maps into [1,5], hits both bounds, preserves order") {
    check(Prop.forAll(doubles) { xs =>
      xs.distinct.size > 1 ==> {
        val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
        val mm = df.agg(min($"v").as("lo"), max($"v").as("hi"))
        val scaled = df.crossJoin(mm)
          .select($"v", (($"v" - $"lo") / ($"hi" - $"lo") * 4.0 + 1.0).as("s"))
          .collect().map(r => (r.getDouble(0), r.getDouble(1)))
        val inBounds = scaled.forall { case (_, s) =>
          s >= 1.0 - 1e-9 && s <= 5.0 + 1e-9 }
        val hitsBounds =
          math.abs(scaled.map(_._2).max - 5.0) < 1e-9 &&
            math.abs(scaled.map(_._2).min - 1.0) < 1e-9
        val sorted = scaled.sortBy(_._1).map(_._2)
        val monotone = sorted.zip(sorted.drop(1)).forall { case (a, b) => a <= b }
        inBounds && hitsBounds && monotone
      }
    })
  }

  test("top-k equals full-sort prefix for generated relations") {
    check(Prop.forAll(doubles) { xs =>
      xs.nonEmpty ==> {
        val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
        val topk = df.orderBy(desc("v"), asc("id")).limit(5)
          .collect().map(_.getLong(0)).toSeq
        val full = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
          .sortBy { case (id, v) => (-v, id) }.take(5).map(_._1).toSeq
        topk == full
      }
    })
  }

  test("union-all cardinality is additive; distinct union matches set union") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 20)),
      Gen.listOf(Gen.choose(0, 20))) { (a, b) =>
      val da = a.toDF("v"); val db = b.toDF("v")
      (da.union(db).count() == a.size + b.size) &&
        (da.union(db).distinct().count() == (a ++ b).distinct.size)
    })
  }

  test("anti-join + semi-join partition any keyed relation") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 30)),
      Gen.listOf(Gen.choose(0, 30))) { (l, r) =>
      val left = l.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "k")
      val right = r.toDF("k")
      val anti = left.join(right, Seq("k"), "left_anti").count()
      val semi = left.join(right, Seq("k"), "left_semi").count()
      anti + semi == l.size
    })
  }

  test("JaccardSorted equals the declarative set formulation on random sets") {
    val words: Gen[List[String]] =
      Gen.listOfN(30, Gen.oneOf((1 to 20).map(i => s"w$i")))
    check(Prop.forAll(words, words) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      (sa.nonEmpty && sb.nonEmpty) ==> {
        val df = Seq((sa, sb)).toDF("a", "b")
        val fused = df.select(
          graft.functions.SetSimilarityFunctions.jaccard_sorted($"a", $"b"))
          .first().getDouble(0)
        val declarative = df.select(
          size(array_intersect($"a", $"b")).cast("double")
            / size(array_union($"a", $"b"))).first().getDouble(0)
        fused == declarative
      }
    }, n = 30)
  }

  test("SortedLongIntersect equals the set intersection on random sets") {
    val longs: Gen[List[Long]] =
      Gen.listOfN(40, Gen.choose(0L, 60L))
    check(Prop.forAll(longs, longs) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val df = Seq((sa, sb)).toDF("a", "b")
      val fused = df.select(
        graft.functions.SetSimilarityFunctions.sorted_long_intersect(
          $"a", $"b")).first().getLong(0)
      fused == sa.toSet.intersect(sb.toSet).size.toLong
    }, n = 30)
  }

  test("ChunkFingerprints: count and content match the spec on random text") {
    val texts: Gen[String] = for {
      n <- Gen.choose(0, 300)
      ws <- Gen.listOfN(n, Gen.oneOf((1 to 50).map(i => s"t$i")))
    } yield ws.mkString(" ")
    check(Prop.forAll(texts) { txt =>
      val toks = txt.split("\\s+").filter(_.nonEmpty)
      val expectedN = math.max((toks.length + 95) / 96, 1)
      val df = Seq(Tuple1(txt)).toDF("text")
      val fps = df.select(graft.functions.TextFunctions
        .chunk_fingerprints($"text", 128, 96).as("f"))
        .first().getSeq[String](0)
      val expected = (0 until expectedN).map { i =>
        val chunk = toks.slice(i * 96, i * 96 + 128).mkString(" ")
        java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
      }
      fps.toList == expected.toList
    }, n = 30)
  }

  test("CosineSim/DotProduct are bit-equal to the HOF folds") {
    val vecs: Gen[List[Double]] =
      Gen.listOfN(16, Gen.choose(-100.0, 100.0))
    check(Prop.forAll(vecs, vecs) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val fusedDot = df.select(
        graft.functions.VectorFunctions.dot_product($"a", $"b"))
        .first().getDouble(0)
      val hofDot = df.select(graft.ops.Similarity.dot($"a", $"b"))
        .first().getDouble(0)
      val fusedCos = df.select(
        graft.functions.VectorFunctions.cosine_sim($"a", $"b"))
        .first().getDouble(0)
      val hofCos = df.select(graft.ops.Similarity.dot($"a", $"b")
        / (graft.ops.Similarity.norm($"a") * graft.ops.Similarity.norm($"b")))
        .first().getDouble(0)
      // bit equality, not tolerance: identical fold order is the claim
      java.lang.Double.doubleToLongBits(fusedDot) ==
        java.lang.Double.doubleToLongBits(hofDot) &&
      java.lang.Double.doubleToLongBits(fusedCos) ==
        java.lang.Double.doubleToLongBits(hofCos)
    }, n = 30)
  }

  test("WordShingles equals the declarative shingle formulation") {
    val texts: Gen[String] = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, Gen.oneOf((1 to 8).map(i => s"t$i")))
    } yield ws.mkString(" ")
    check(Prop.forAll(texts) { t =>
      val df = Seq(t).toDF("text")
      val fused = df.select(graft.ops.Dedup.shingles($"text"))
        .first().getSeq[String](0)
      val declarative = df.select(
        graft.ops.Dedup.shinglesDeclarative($"text"))
        .first().getSeq[String](0)
      fused == declarative
    }, n = 30)
  }

  test("rolling-hash fingerprint matches a plain fold on generated strings") {
    check(Prop.forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty)) { s0 =>
      val expected = s0.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
      val got = Seq(s0).toDF("t")
        .select(aggregate(
          filter(split($"t", ""), c => c =!= lit("")), lit(0L),
          (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L))
        .first().getLong(0)
      got == expected
    }, n = 10)
  }
}
