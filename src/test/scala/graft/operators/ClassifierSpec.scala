package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Separable synthetic corpus: positive docs are stopword-heavy
  // ("the a of and ..."), negatives are content-word soup — the
  // stopword-ratio feature alone separates them.
  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(11)
    val stop = Classifier.StopWords
    val content = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val pool = if (pos) stop ++ content.take(2) else content
      val words = Seq.fill(20 + rnd.nextInt(10))(
        pool(rnd.nextInt(pool.length)))
      (i.toLong, words.mkString(" "), if (pos) 1.0 else 0.0)
    }.toDF("doc_id", "text", "y")
  }

  test("training is deterministic call-to-call (frozen weights are " +
    "re-derivable by oracleGen)") {
    val c = corpus(200)
    val w1 = Classifier.train(c, "text", "doc_id", "y")
    val w2 = Classifier.train(c.repartition(7), "text", "doc_id", "y")
    assert(w1.toSeq == w2.toSeq,
      "weights must be byte-identical regardless of partitioning")
  }

  test("log-loss is non-increasing and the model separates a " +
    "separable corpus") {
    val c = corpus(400)
    val (w, trace) = Classifier.trainWithTrace(
      c, "text", "doc_id", "y", iters = 80, lr = 0.5,
      maxTrainRows = 100000L)
    trace.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"loss rose: $a -> $b")
      case _ => ()
    }
    val scored = Classifier.score(c, "text", "doc_id", w.toSeq)
      .join(c.select(col("doc_id"), col("y")), Seq("doc_id"))
    val acc = scored
      .filter(col("keep").cast("double") === col("y")).count()
      .toDouble / scored.count()
    assert(acc >= 0.95, s"accuracy $acc on a separable corpus")
  }

  test("distributed scoring margin is bit-identical to a driver-side " +
    "replay of the same left-associated dot product") {
    val c = corpus(100)
    val w = Classifier.train(c, "text", "doc_id", "y").toSeq
    val scored = Classifier.score(c, "text", "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val feats = c
      .select(col("doc_id"),
        array(Classifier.features(col("text")): _*).as("f"))
      .collect()
    feats.foreach { r =>
      val x = r.getSeq[Double](1)
      var m = 0.0
      var j = 0
      while (j < Classifier.Dim) { m += w(j) * x(j); j += 1 }
      // driver fold is the same (w0*f0 + w1*f1 + ...) order
      assert(java.lang.Double.doubleToLongBits(m) ==
        java.lang.Double.doubleToLongBits(scored(r.getLong(0))),
        s"doc ${r.getLong(0)}")
    }
  }

  test("empty and whitespace-only docs are excluded, never NaN") {
    val c = corpus(50)
      .union(Seq((900L, "", 0.0), (901L, "   ", 0.0))
        .toDF("doc_id", "text", "y"))
    val w = Classifier.train(c, "text", "doc_id", "y").toSeq
    val scored = Classifier.score(c, "text", "doc_id", w)
    assert(scored.filter(col("doc_id") >= 900L).count() == 0)
    assert(scored.filter(isnan(col("margin"))).count() == 0)
  }

  test("maxTrainRows caps the collected sample deterministically " +
    "(prefix by id)") {
    val c = corpus(300)
    val wCap = Classifier.train(c, "text", "doc_id", "y",
      maxTrainRows = 100L)
    val wPrefix = Classifier.train(c.filter(col("doc_id") < 100),
      "text", "doc_id", "y")
    assert(wCap.toSeq == wPrefix.toSeq,
      "capped sample must be exactly the id-ordered prefix")
  }
}
