package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins IncrementalAgg.mergeCountSum: group birth/update/death, the
  * inconsistent-delta failure mode, and fixture-level parity of the
  * c31 fold against a from-scratch recompute.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge handles birth, update, delete and death exactly") {
    import spark.implicits._
    val state = Seq(("a", 2L, BigDecimal("10.00")),
        ("b", 1L, BigDecimal("5.00")),
        ("c", 3L, BigDecimal("9.00")))
      .toDF("k", "n", "tot")
      .select(col("k"), col("n"), col("tot").cast("decimal(12,2)").as("tot"))
    val delta = Seq(
        ("a", 1L, BigDecimal("4.00")),   // insert into existing group
        ("b", -1L, BigDecimal("-5.00")), // delete -> group death
        ("c", 0L, BigDecimal("1.50")),   // pure value update
        ("d", 2L, BigDecimal("7.00")))   // group birth
      .toDF("k", "dn", "ds")
      .select(col("k"), col("dn"), col("ds").cast("decimal(12,2)").as("ds"))
    val out = IncrementalAgg.mergeCountSum(state, delta, "k")
      .select(col("k"), col("n"), col("tot").cast("string"))
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "a" -> ((3L, "14.00")),
      "c" -> ((3L, "10.50")),
      "d" -> ((2L, "7.00"))), s"unexpected merge result: $out")
  }

  test("a delta that drives a count negative fails loudly") {
    import spark.implicits._
    val state = Seq(("a", 1L, BigDecimal("1.00"))).toDF("k", "n", "tot")
      .select(col("k"), col("n"), col("tot").cast("decimal(12,2)").as("tot"))
    val delta = Seq(("a", -2L, BigDecimal("-2.00"))).toDF("k", "dn", "ds")
      .select(col("k"), col("dn"), col("ds").cast("decimal(12,2)").as("ds"))
    val e = intercept[Exception] {
      IncrementalAgg.mergeCountSum(state, delta, "k").collect()
    }
    assert(e.getMessage != null &&
      e.toString.contains("IncrementalAgg") ||
      Option(e.getCause).exists(_.toString.contains("IncrementalAgg")),
      s"expected the IncrementalAgg raise_error, got: $e")
  }

  test("c31 fold equals from-scratch recompute on the fixture") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val folded = graft.SparkEntry.queries("c31_incremental_agg")(spark, dir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val money = (c: org.apache.spark.sql.Column) => c.cast("decimal(12,2)")
    val ord = graft.Engine.Tables(spark, dir).orders
    val recomputed = ord
      .filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
      .withColumn("p", money(col("o_totalprice")) +
        when(pmod(col("o_orderkey"), lit(7)) === 0,
          lit("1.00").cast("decimal(12,2)"))
          .otherwise(lit("0.00").cast("decimal(12,2)")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("p")).cast("double").as("total"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(folded == recomputed,
      s"fold vs recompute diverge: $folded vs $recomputed")
  }
}
