package graft.plans

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OptimizerRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // spark.range keeps the plan symbolic (a Seq.toDF LocalRelation
  // would be constant-folded away before the assertion)
  private def docs = spark.range(500).select(
    col("id"),
    concat(lit("document body number "), col("id")).as("a"),
    concat(lit("document body numbre "), col("id") + (col("id") % 7))
      .as("b"))

  private def thresholds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan
      .collect { case node => node.expressions }.flatten
      .flatMap(_.collect {
        case Levenshtein(_, _, Some(t)) => t.eval().asInstanceOf[Int]
      })

  test("levenshtein <= k rewrites to the banded thresholded form") {
    val q = docs.filter(levenshtein(col("a"), col("b")) <= 5)
    assert(thresholds(q) == Seq(5), q.queryExecution.optimizedPlan)
  }

  test("strict < and mirrored forms rewrite with the right bound") {
    assert(thresholds(
      docs.filter(levenshtein(col("a"), col("b")) < 5)) == Seq(4))
    assert(thresholds(
      docs.filter(lit(5) >= levenshtein(col("a"), col("b")))) == Seq(5))
    assert(thresholds(
      docs.filter(lit(5) > levenshtein(col("a"), col("b")))) == Seq(4))
  }

  test("upper-bound and equality predicates are left alone") {
    assert(thresholds(
      docs.filter(levenshtein(col("a"), col("b")) >= 5)).isEmpty)
    assert(thresholds(
      docs.filter(levenshtein(col("a"), col("b")) === 5)).isEmpty)
  }

  test("rewritten filter returns exactly the rows of the full computation") {
    import spark.implicits._
    val want = docs
      .withColumn("d", levenshtein(col("a"), col("b")))
      .filter(col("d") <= 4).select("id").as[Long].collect().sorted
    assert(want.nonEmpty && want.length < 500, "fixture must discriminate")
    val got = docs.filter(levenshtein(col("a"), col("b")) <= 4)
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want))
    val gotStrict = docs.filter(levenshtein(col("a"), col("b")) < 5)
      .select("id").as[Long].collect().sorted
    assert(gotStrict.sameElements(want))
  }

  test("null inputs stay excluded after the rewrite") {
    import spark.implicits._
    val withNulls = spark.range(10).select(
      col("id"),
      when(col("id") % 2 === 0, concat(lit("x"), col("id")))
        .as("a"),
      lit("x1").as("b"))
    val got = withNulls.filter(levenshtein(col("a"), col("b")) <= 2)
      .select("id").as[Long].collect().sorted
    assert(got.forall(_ % 2 == 0))
    assert(thresholds(
      withNulls.filter(levenshtein(col("a"), col("b")) <= 2)) == Seq(2))
  }

  // ---- JaroWinklerThresholdRule -------------------------------------

  import org.apache.spark.sql.graft.expressions.{jaro_winkler, JaroWinkler}

  private def jwThresholds(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    df.queryExecution.optimizedPlan
      .collect { case node => node.expressions }.flatten
      .flatMap(_.collect {
        case JaroWinkler(_, _, Some(t)) => t
      })

  test("jaro_winkler >= t pushes the threshold into the expression") {
    val q = docs.filter(jaro_winkler(col("a"), col("b")) >= 0.93)
    assert(jwThresholds(q) == Seq(0.93), q.queryExecution.optimizedPlan)
    // mirrored + strict forms
    assert(jwThresholds(
      docs.filter(lit(0.95) <= jaro_winkler(col("a"), col("b")))) ==
      Seq(0.95))
    assert(jwThresholds(
      docs.filter(jaro_winkler(col("a"), col("b")) > 0.9)) == Seq(0.9))
  }

  test("jaro_winkler low/upper-bound predicates are left alone") {
    // t <= 0.8: the length bound 5t-4 is vacuous, no rewrite
    assert(jwThresholds(
      docs.filter(jaro_winkler(col("a"), col("b")) >= 0.5)).isEmpty)
    assert(jwThresholds(
      docs.filter(jaro_winkler(col("a"), col("b")) <= 0.95)).isEmpty)
  }

  test("jaro_winkler bounded filter returns exactly the full-kernel rows") {
    import spark.implicits._
    // mixed lengths so the length guard actually fires on some pairs:
    // short strings vs long ones can never reach 0.93
    val mixed = spark.range(200).select(
      col("id"),
      when(col("id") % 3 === 0, concat(lit("ab"), col("id") % 10))
        .otherwise(concat(lit("record linkage target string "),
          col("id") % 5)).as("a"),
      concat(lit("record linkage target string "), col("id") % 7)
        .as("b"))
    val want = mixed
      .withColumn("s", jaro_winkler(col("a"), col("b")))
      .filter(col("s") >= 0.93).select("id").as[Long].collect().sorted
    assert(want.nonEmpty && want.length < 200, "fixture must discriminate")
    val got = mixed.filter(jaro_winkler(col("a"), col("b")) >= 0.93)
      .select("id").as[Long].collect().sorted
    assert(jwThresholds(mixed.filter(
      jaro_winkler(col("a"), col("b")) >= 0.93)) == Seq(0.93))
    assert(got.sameElements(want))
  }

  test("length-bound guard: provably-unreachable pairs short-circuit to 0") {
    // direct check of the bounded kernel: 4 bytes vs 40 bytes has
    // min/max = 0.1 < 5*0.93-4 = 0.65, so the bounded form returns
    // 0.0 without scanning; the unbounded form returns the true
    // (sub-threshold) similarity — both below t, same predicate
    import org.apache.spark.sql.graft.JaroWinklerUtil
    import org.apache.spark.unsafe.types.UTF8String
    val a = UTF8String.fromString("abcd")
    val b = UTF8String.fromString("abcd" + "x" * 36)
    val full = JaroWinklerUtil.similarity(a, b)
    assert(full > 0.0 && full < 0.93)
    assert(JaroWinklerUtil.similarityBounded(a, b, 0.93) == 0.0)
    // near the ratio boundary the guard must NOT fire: identical
    // strings (ratio 1.0) keep their exact similarity
    val c = UTF8String.fromString("record linkage")
    assert(JaroWinklerUtil.similarityBounded(c, c, 0.93) ==
      JaroWinklerUtil.similarity(c, c))
  }
}
