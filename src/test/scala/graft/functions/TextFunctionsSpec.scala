package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenization handles empties, multiple spaces, punctuation counting") {
    val df = Seq(
      ("a", "the quick  brown fox."),
      ("b", ""),
      ("c", "   "),
      ("d", "one")).toDF("k", "t")
    val got = df.select($"k",
      TextFunctions.tokenCount($"t").as("n"),
      TextFunctions.punctCount($"t").as("p"),
      TextFunctions.meanTokenLen($"t").as("mtl"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got("a")._1 == 4 && got("a")._2 == 1)
    assert(got("b")._1 == 0 && got("b")._3 == 0.0)
    assert(got("c")._1 == 0)
    assert(got("d")._1 == 1 && got("d")._3 == 3.0)
  }

  test("langId: charset beacons and stopword profiles") {
    val df = Seq(
      ("en", "the cat sat on the mat and it is happy"),
      ("de", "der hund ist nicht mit der katze und das ist gut"),
      ("fr", "le chat est dans la maison et il est content pour un moment"),
      ("es", "el perro es un animal y la casa es grande por que"),
      ("zh", "这是一个中文句子"),
      ("ru", "это русское предложение"),
      ("und", "xyzzy plugh qwerty")).toDF("expected", "t")
    val got = df.select($"expected", TextFunctions.langId($"t").as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  Quick   fox", "a quick fox")).toDF("x", "y")
      .select(TextFunctions.fingerprint($"x").as("fx"),
        TextFunctions.fingerprint($"y").as("fy")).head()
    assert(df.getString(0) == df.getString(1))
  }

  test("cleanText strips urls/emails, collapses whitespace") {
    val raw = "see https://ex.com/a?b=1 or mail bob.smith+x@ex-mail.org  \t now"
    val got = Seq(raw).toDF("t")
      .select(TextFunctions.cleanText($"t")).head().getString(0)
    assert(got == "see or mail now")
    val noop = Seq("already clean").toDF("t")
      .select(TextFunctions.cleanText($"t")).head().getString(0)
    assert(noop == "already clean")
  }

  test("shingles: n-grams with short-doc guard") {
    val df = Seq(("a b c d", 1), ("a b", 2)).toDF("t", "k")
    val s3 = df.filter($"k" === 1)
      .select(TextFunctions.shingles($"t", 3).as("s")).head().getSeq[String](0)
    assert(s3 == Seq("a b c", "b c d"))
    val short = df.filter($"k" === 2)
      .select(TextFunctions.shingles($"t", 3).as("s")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("quality score ranges and orders sensibly") {
    val good = "the quick brown fox jumps over the lazy dog and then it runs " * 5
    val bad = "!!! ??? ,,, ;;; ::: !!!"
    val df = Seq(("good", good), ("bad", bad)).toDF("k", "t")
      .select($"k", TextFunctions.qualityScore($"t").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df("good") > df("bad"))
    assert(df.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("rollingHash is order-sensitive where token-set ops are not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y").select(
      TextFunctions.rollingHash($"x").as("hx"),
      TextFunctions.rollingHash($"y").as("hy")).head()
    assert(df.getLong(0) != df.getLong(1))
  }
}
