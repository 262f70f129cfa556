package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f), Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (4L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)),
    (5L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))) // length mismatch
    .toDF("id", "a", "b")

  test("native cosine_sim matches the HOF reference implementation") {
    val got = vecs.select($"id",
      VectorFunctions.cosineSim($"a", $"b").as("nat"),
      VectorFunctions.cosineSimHof($"a", $"b").as("ref"))
      .collect()
    got.foreach { r =>
      val (id, nat) = (r.getLong(0), r.getDouble(1))
      // length mismatch: native=0.0 by convention; HOF ref is null
      // (zip_with pads with null), so only compare where ref exists.
      if (id == 5L) assert(nat == 0.0 && r.isNullAt(2))
      else assert(math.abs(nat - r.getDouble(2)) < 1e-12, s"id=$id")
    }
    val byId = got.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(byId(1L) - 1.0) < 1e-12)
    assert(byId(2L) == 0.0)
    assert(byId(4L) == 0.0) // zero norm -> 0, not NaN
    assert(math.abs(byId(3L) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("dot_product native vs HOF") {
    val got = vecs.filter($"id" =!= 5).select(
      VectorFunctions.dotProduct($"a", $"b").as("nat"),
      VectorFunctions.dotProductHof($"a", $"b").as("ref")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSim($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("int8_codes / int8_dot: round-trip error bounded by scale/2 " +
    "per component, the quantized-cosine upper bound is SOUND over " +
    "random vectors, and a zero scale yields zero codes") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 300L).map { i =>
      (i,
        Seq.fill(16)(rnd.nextFloat() * 4f - 2f),
        Seq.fill(16)(rnd.nextFloat() * 4f - 2f))
    }.toDF("id", "a", "b")
    val got = rows.select($"id",
      VectorFunctions.cosineSim($"a", $"b").as("cos"),
      ((VectorFunctions.int8Scale($"b") *
        VectorFunctions.int8Dot(
          VectorFunctions.int8Codes($"b", VectorFunctions.int8Scale($"b")),
          $"a") +
        lit(0.5) * VectorFunctions.int8Scale($"b") *
          aggregate(transform($"a", x => abs(x.cast("double"))),
            lit(0.0), (acc, x) => acc + x)) /
        (sqrt(VectorFunctions.dotProduct($"a", $"a")) *
          sqrt(VectorFunctions.dotProduct($"b", $"b"))) + lit(1e-6))
        .as("upper"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(1),
        s"upper bound violated at id=${r.getLong(0)}: " +
          s"cos=${r.getDouble(1)} upper=${r.getDouble(2)}")
      // the bound must also be TIGHT enough to prefilter (SQ8 slack
      // for 16 dims sits well under 0.1 cosine)
      assert(r.getDouble(2) - r.getDouble(1) < 0.1,
        s"bound uselessly loose at id=${r.getLong(0)}")
    }
    // component-wise reconstruction error <= scale/2
    val rt = rows.limit(50).select($"b",
      VectorFunctions.int8Scale($"b").as("s"),
      VectorFunctions.int8Codes($"b",
        VectorFunctions.int8Scale($"b")).as("q"))
      .collect()
    rt.foreach { r =>
      val v = r.getSeq[Float](0)
      val s = r.getDouble(1)
      val q = r.getAs[Array[Byte]](2)
      v.zip(q).foreach { case (x, c) =>
        assert(math.abs(x.toDouble - s * c) <= s / 2 + 1e-12) }
    }
    val zero = Seq((1L, Seq(0.0f, 0.0f))).toDF("id", "v")
      .select(VectorFunctions.int8Codes($"v", lit(0.0)).as("q"))
      .head().getAs[Array[Byte]](0)
    assert(zero.forall(_ == 0))
  }

  test("simhash64: identical token sets hash equal; near sets differ in few bits") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(7, "CHANGED").updated(33, "ALSO")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq(
      ("same1", base), ("same2", base), ("near", near), ("far", far))
      .toDF("k", "toks")
      .select($"k", VectorFunctions.simhash64($"toks").as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("same1") == m("same2"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m("same1"), m("near")) < 20)
    assert(ham(m("same1"), m("near")) > 0)
    assert(ham(m("same1"), m("far")) > ham(m("same1"), m("near")))
  }

  test("SQL registration via GraftExtensions") {
    val one = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "simhash64(array('a','b')) AS h, " +
        "shingle_hashes('a b c d', 2) AS sh, " +
        "minhash_signature(shingle_hashes('a b c d', 2), 8) AS sig").head()
    assert(math.abs(one.getDouble(0) - 1.0) < 1e-12)
    assert(one.getDouble(1) == 11.0)
    assert(one.getLong(2) != 0L)
    assert(one.getSeq[Long](3).length == 3) // "a b","b c","c d"
    assert(one.getSeq[Long](4).length == 8)
  }

  test("word_shingles: order, duplicates, multi-space join, short docs") {
    val df = Seq(
      ("plain", "a b c d"),
      ("dup", "x y x y x"),          // repeated windows preserved
      ("spaces", "  a   b  c "),     // runs of spaces tokenize away
      ("short", "a b"),              // fewer than n tokens
      ("empty", "")).toDF("k", "t")
    val got = df.select($"k",
      org.apache.spark.sql.graft.expressions.word_shingles($"t", 3).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("plain") == Seq("a b c", "b c d"))
    assert(got("dup") == Seq("x y x", "y x y", "x y x"))
    assert(got("spaces") == Seq("a b c")) // joined with SINGLE spaces
    assert(got("short") == Seq.empty)
    assert(got("empty") == Seq.empty)
    // SQL registration
    assert(spark.sql("SELECT word_shingles('a b c', 2) AS s").head()
      .getSeq[String](0) == Seq("a b", "b c"))
  }

  test("jaccard_sorted: identical, disjoint, partial, empty, null") {
    val df = Seq(
      ("ident", Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      ("disjoint", Seq(1L, 2L), Seq(3L, 4L)),
      ("partial", Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)),
      ("emptyL", Seq.empty[Long], Seq(1L)),
      ("emptyBoth", Seq.empty[Long], Seq.empty[Long]))
      .toDF("k", "a", "b")
    val got = df.select($"k",
      org.apache.spark.sql.graft.expressions.jaccard_sorted($"a", $"b").as("j"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("ident") == 1.0)
    assert(got("disjoint") == 0.0)
    assert(got("partial") == 2.0 / 6.0)
    assert(got("emptyL") == 0.0)
    assert(got("emptyBoth") == 0.0)
    val n = Seq((Option(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(org.apache.spark.sql.graft.expressions.jaccard_sorted($"a", $"b"))
      .head()
    assert(n.isNullAt(0))
    // null ELEMENTS are skipped, not NPE'd / misread
    val withNulls = spark.sql(
      "SELECT jaccard_sorted(array(1L, CAST(NULL AS BIGINT), 2L), " +
        "array(1L, 2L)) AS j").head().getDouble(0)
    assert(withNulls == 1.0, s"got $withNulls")
  }

  test("md5_uniform60: bit-identical to the conv(substring(md5)) " +
    "composition on varied inputs; null-safe; non-negative") {
    import org.apache.spark.sql.graft.expressions.md5_uniform60
    // varied content: empty, unicode (incl. supplementary plane),
    // long strings, digits — plus 1k random ascii rows
    val fixed = Seq("", "a", "hello world", "naïve café",
      "emoji 😀 mix", "0", "x" * 5000, "tab\tnl\n")
      .toDF("s")
    val rand = spark.range(0, 1000)
      .select(md5(col("id").cast("string")).as("s"))
    val both = fixed.unionByName(rand)
      .select(md5_uniform60(col("s")).as("fused"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
          .as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    assert(both.filter(col("fused") < 0).count() == 0)
    val n = Seq[Option[String]](None).toDF("s")
      .select(md5_uniform60(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("md5_uniform60_tail: bit-identical to the conv(substring(md5, " +
    "16, 15)) composition; permuteFrom equals (h1 + i*h2) mod 2^60") {
    import org.apache.spark.sql.graft.expressions.md5_uniform60_tail
    import graft.functions.PortableHash
    val rand = spark.range(0, 1000)
      .select(md5(col("id").cast("string")).as("s"))
    val both = rand
      .select(md5_uniform60_tail(col("s")).as("fused"),
        conv(substring(md5(col("s")), 16, 15), 16, 10).cast("long")
          .as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)
    assert(both.filter(col("fused") < 0).count() == 0)
    // KM permutation: the overflow-free split arithmetic must equal
    // exact BigInt (h1 + i*h2) mod 2^60 — worst cases included (both
    // halves near 2^60, the largest i the family ever uses).
    val edge = Seq((0L, 0L), ((1L << 60) - 1, (1L << 60) - 1),
      ((1L << 60) - 1, 1L), (1L, (1L << 60) - 1))
    val rnd = new scala.util.Random(7)
    val cases = edge ++ Seq.fill(500)(
      (rnd.nextLong() >>> 4, rnd.nextLong() >>> 4))
    val rows = cases.zipWithIndex
      .map { case ((a, b), ix) => (a, b, ix % 128) }
      .toDF("h1", "h2", "i")
      .select(col("h1"), col("h2"), col("i"),
        PortableHash.permuteFrom(col("h1"), col("h2"), col("i"))
          .as("p"))
      .collect()
    rows.foreach { r =>
      val expect = ((BigInt(r.getLong(0)) +
        BigInt(r.getInt(2)) * BigInt(r.getLong(1))) mod
        (BigInt(1) << 60)).toLong
      assert(r.getLong(3) == expect,
        s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getInt(2)})")
    }
  }

  test("hyperplane_sigs fused expression is bit-identical to the " +
    "composed per-plane dot-product form (float + double, refinement " +
    "depth, length mismatch, null)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2f - 1f))) :+
      ((201L, Seq(1.0f, 2.0f))) // length mismatch: every proj 0.0
    val df = rows.toDF("id", "v")
    for (bits <- Seq(2, 4, 16); tables <- Seq(1, 12)) {
      val cmp = df.select($"id",
        VectorFunctions.hyperplaneSigs($"v", bits, tables, 16).as("fused"),
        VectorFunctions.hyperplaneSigsComposed($"v", bits, tables, 16)
          .as("composed"))
        .collect()
      cmp.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"id=${r.getLong(0)} bits=$bits tables=$tables: " +
            s"${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
      }
    }
    // double input takes the same path
    val dd = df.select($"id",
      VectorFunctions.asDouble($"v").as("v"))
    val cmpD = dd.select(
      VectorFunctions.hyperplaneSigs($"v", 4, 3, 16).as("fused"),
      VectorFunctions.hyperplaneSigsComposed($"v", 4, 3, 16).as("composed"))
      .collect()
    cmpD.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // the fused values also equal a driver-side replay off planeMatrix
    // (the oracle export) — the three forms agree
    val m = VectorFunctions.planeMatrix(4, 2, 16)
    val one = df.filter($"id" === 1L).select(
      VectorFunctions.hyperplaneSigs($"v", 4, 2, 16)).head.getSeq[Long](0)
    val v1 = rows.head._2
    val expect = (0 until 2).map { t =>
      (0 until 4).map { p =>
        val proj = v1.zip(m(t)(p)).map { case (x, pl) => x.toDouble * pl }
          .foldLeft(0.0)(_ + _)
        if (proj >= 0) 1L << p else 0L
      }.foldLeft(0L)(_ | _)
    }
    assert(one == expect, s"$one vs $expect")
    // null vector -> null signature array
    val nulls = Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("id", "v")
      .select(VectorFunctions.hyperplaneSigs($"v", 4, 2, 16)).head
    assert(nulls.isNullAt(0))
  }

  test("codegen path actually compiles (no fallback): project over 1k rows") {
    val n = spark.range(1000).select($"id",
      array_repeat(($"id" % 7).cast("double") + 1.0, 64).as("a"),
      array_repeat(($"id" % 5).cast("double") + 2.0, 64).as("b"))
    val out = n.select(VectorFunctions.cosineSim($"a", $"b").as("c"))
      .agg(min($"c"), max($"c")).head()
    // parallel arrays -> cosine exactly 1.0 for every row
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-12)
  }

  test("byte_entropy: known distributions, empty, null, SQL form") {
    import org.apache.spark.sql.graft.expressions.byte_entropy
    val df = Seq(
      (1L, "aaaa"),      // one symbol -> 0 bits
      (2L, "abca"),      // p = .5/.25/.25 -> 1.5 bits
      (3L, "abcd"),      // uniform over 4 -> 2 bits
      (4L, "")           // empty -> 0 by convention
    ).toDF("id", "t")
    val got = df.select($"id", byte_entropy($"t").as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0 && got(4L) == 0.0)
    assert(math.abs(got(2L) - 1.5) < 1e-12, s"got ${got(2L)}")
    assert(math.abs(got(3L) - 2.0) < 1e-12)
    val nul = df.select(byte_entropy(lit(null).cast("string"))).head()
    assert(nul.isNullAt(0))
    val viaSql = spark.sql("SELECT byte_entropy('abca')").head().getDouble(0)
    assert(math.abs(viaSql - 1.5) < 1e-12)
  }

  test("jaro_winkler: textbook values bitwise-equal to the reference engine") {
    import org.apache.spark.sql.graft.expressions.jaro_winkler
    // Expected doubles captured from DuckDB 1.x jaro_winkler_similarity
    // (byte-level, p=0.1, prefix<=4, boost iff jaro>0.7) — the d15
    // oracle hash-checks raw doubles, so these must be EXACT (==).
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abcd", "abcd", 1.0),
      // non-ASCII: byte-level window/matching, same as the oracle
      ("héllo wörld", "hello world", 0.8531468531468531),
      ("ñandú", "ñandu", 0.9095238095238095),
      // either side empty -> 0.0 (NOT textbook both-empty 1.0)
      ("", "", 0.0), ("", "abc", 0.0), ("abc", "", 0.0),
      // below the 0.7 boost threshold: plain jaro, no prefix bonus
      ("abcdef", "abdpqr", 0.6666666666666666))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(jaro_winkler($"a", $"b")).collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, exp), g) =>
      assert(g == exp, s"jw($a, $b): got $g want $exp")
    }
    // null propagation + SQL registration
    val nul = df.limit(1)
      .select(jaro_winkler($"a", lit(null).cast("string"))).head()
    assert(nul.isNullAt(0))
    val viaSql = spark.sql("SELECT jaro_winkler('martha', 'marhta')")
      .head().getDouble(0)
    assert(viaSql == 0.9611111111111111)
  }
}
