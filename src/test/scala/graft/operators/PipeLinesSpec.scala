package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PipeLinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("line pipe: one process per partition, line-for-line transform") {
    val in = spark.createDataset(Seq("hello", "world", "spark"))
      .repartition(2)
    val out = PipeTransform.transformLines(in,
      Seq("tr", "a-z", "A-Z")).collect().toSet
    assert(out == Set("HELLO", "WORLD", "SPARK"))
  }

  test("line pipe with a filtering command changes cardinality") {
    val in = spark.createDataset((1 to 100).map(i => s"line$i"))
      .repartition(4)
    val out = PipeTransform.transformLines(in,
      Seq("grep", "line1")).collect()
    // line1, line10..line19, line100
    assert(out.length == 12)
  }
}
