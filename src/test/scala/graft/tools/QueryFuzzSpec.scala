package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Spark-side half of the random-query differential gate (the DuckDB
  * half is `tools/check.py` over QueryFuzz's output directory, run
  * with the other oracle sweeps). Pinned here:
  *
  *  - generation is DETERMINISTIC for (seed, data) — the differential
  *    gate is reproducible, a failing qfNNN can be re-rolled exactly;
  *  - different seeds actually vary the suite (the gate samples the
  *    grammar, not one frozen corner of it);
  *  - every generated query EXECUTES on Spark — the grammar stays
  *    inside the dialect intersection by construction, so a red row
  *    in check.py is an ENGINE divergence, never a parse error;
  *  - the suite is not vacuous: a healthy fraction of queries return
  *    rows (all-empty results would pass any differential compare).
  */
class QueryFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("generation is deterministic per seed, varies across seeds, " +
    "and every query executes on Spark with a non-vacuous result set") {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    QueryFuzz.tabs.foreach(tb =>
      spark.read.parquet(s"$dir/${tb.name}.parquet")
        .createOrReplaceTempView(tb.name))
    val a = QueryFuzz.generate(spark, dir, seed = 7L, n = 40)
    val b = QueryFuzz.generate(spark, dir, seed = 7L, n = 40)
    assert(a == b, "same (seed, data) must generate the same suite")
    val c = QueryFuzz.generate(spark, dir, seed = 8L, n = 40)
    assert(a.map(_._2) != c.map(_._2),
      "a different seed must generate a different suite")
    var nonEmpty = 0
    a.foreach { case (name, sql) =>
      val rows =
        try spark.sql(sql).count()
        catch {
          case e: Throwable =>
            fail(s"$name failed to execute on Spark: ${e.getMessage}" +
              s"\nSQL: $sql")
        }
      if (rows > 0) nonEmpty += 1
    }
    assert(nonEmpty >= a.size / 2,
      s"suite too vacuous: only $nonEmpty/${a.size} queries returned " +
        "rows — constants are not landing in-domain")
  }
}
