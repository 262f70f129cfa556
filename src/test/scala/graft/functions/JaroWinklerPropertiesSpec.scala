package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.JaroWinklerUtil
import org.apache.spark.unsafe.types.UTF8String

/** Property suite for the Jaro-Winkler kernel, raw ScalaCheck with
  * fixed seeds (same offline pattern as the other property specs).
  * The unit spec pins values captured from the reference engine; this
  * sweeps random inputs against an INDEPENDENTLY-CODED naive
  * reference (different data structures and loop order) plus the
  * algebraic properties the optimizer rule's correctness rests on.
  */
class JaroWinklerPropertiesSpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  /** Naive reference: list/set-based, O(n^2) matching by explicit
    * window predicate rather than a scan cursor.
    */
  private def ref(aS: String, bS: String): Double = {
    val a = aS.getBytes("UTF-8")
    val b = bS.getBytes("UTF-8")
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val taken = scala.collection.mutable.Set.empty[Int]
    val matchesA = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- a.indices) {
      val j = (math.max(0, i - window) to
        math.min(b.length - 1, i + window))
        .find(j => !taken(j) && a(i) == b(j))
      j.foreach { jj => taken += jj; matchesA += i }
    }
    val m = matchesA.length
    if (m == 0) return 0.0
    val bMatched = taken.toList.sorted
    val t = matchesA.zip(bMatched).count { case (i, j) => a(i) != b(j) } / 2
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  private val genStr: Gen[String] = for {
    n <- Gen.choose(0, 24)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ Seq(' ', 'é')))
  } yield cs.mkString

  test("kernel equals the independent reference on random strings") {
    (0 until 400).foreach { i =>
      val a = sample(genStr, 2000L + i)
      val b = sample(genStr, 7000L + i)
      assert(jw(a, b) == ref(a, b), s"mismatch on <$a> <$b>")
    }
  }

  test("symmetry, range, and identity") {
    (0 until 200).foreach { i =>
      val a = sample(genStr, 3000L + i)
      val b = sample(genStr, 8000L + i)
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric on <$a> <$b>")
      assert(s >= 0.0 && s <= 1.0)
      if (a.nonEmpty) assert(jw(a, a) == 1.0)
    }
  }

  test("jaroLinkage equals the naive blocked join on random corpora") {
    // operator-level property: canonicalize-first + membership
    // expansion is EQUAL to the naive per-member-pair join on
    // arbitrary inputs — duplicate groups, shared prefixes, empty
    // titles, multi-lang, single-char titles
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.expressions.jaro_winkler
    val genCorpus: Gen[List[(Long, String, String)]] = for {
      n <- Gen.choose(2, 30)
      rows <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "fr")
        len <- Gen.choose(0, 10)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', ' '))
      } yield (lang, cs.mkString))
    } yield rows.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
    (0 until 6).foreach { i =>
      val rows = sample(genCorpus, 5000L + i)
      val df = rows.toDF("id", "lang", "title")
      val got = graft.operators.Dedup
        .jaroLinkage(df, "id", "lang", "title", threshold = 0.85)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val f = df.withColumn("blk", substring(col("title"), 1, 2))
      val naive = f.select(col("id").as("id_a"), col("lang"), col("blk"),
        col("title").as("t_a"))
        .join(f.select(col("id").as("id_b"), col("lang"), col("blk"),
          col("title").as("t_b")), Seq("lang", "blk"))
        .where(col("id_b") > col("id_a"))
        .select(col("id_a"), col("id_b"),
          jaro_winkler(col("t_a"), col("t_b")).as("sim"))
        .where(col("sim") >= 0.85)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == naive,
        s"case $i: extra=${got -- naive} missing=${naive -- got}")
    }
  }

  test("threshold guard is sound: bounded says 0 only when full < t") {
    // the optimizer rule's contract — similarityBounded(a, b, t)
    // differs from similarity(a, b) ONLY on pairs provably below t
    val ts = Seq(0.85, 0.9, 0.93, 0.97)
    (0 until 200).foreach { i =>
      val a = sample(genStr, 4000L + i)
      val b = sample(genStr, 9000L + i)
      val full = jw(a, b)
      ts.foreach { t =>
        val bounded = JaroWinklerUtil.similarityBounded(
          UTF8String.fromString(a), UTF8String.fromString(b), t)
        if (bounded != full)
          assert(bounded == 0.0 && full < t,
            s"guard dropped a qualifying pair <$a> <$b> t=$t " +
              s"full=$full bounded=$bounded")
        assert((bounded >= t) == (full >= t))
      }
    }
  }
}
