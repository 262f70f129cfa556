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
}
