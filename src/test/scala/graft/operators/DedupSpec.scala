package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (1L, base),
      (2L, base),                                     // exact dup of 1
      (3L, base.replace("lazy", "sleepy")),           // near dup of 1
      (4L, "completely different words about spark engines and columnar data processing"),
      (5L, base.toUpperCase),                         // exact dup after normalization
      (6L, "short doc"))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups normalized duplicates, keeps min id") {
    val got = Dedup.exact(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // 1,2,5 collapse (5 only differs in case) => keep 1, n=3
    assert(got(1L) == 3L)
    assert(got(3L) == 1L && got(4L) == 1L && got(6L) == 1L)
  }

  test("minhash LSH finds the near-dup pair and not the unrelated doc") {
    val pairs = Dedup.nearDupPairs(corpus, "text", "doc_id",
      threshold = 0.5, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // exact dup: jaccard 1
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      s"near dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("LSH recall vs exact jaccard on the documents fixture") {
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val sets = docs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(col("text"), 3)).as("ts"))
    val a = sets.select(col("doc_id").as("id_a"), col("ts").as("sa"))
    val b = sets.select(col("doc_id").as("id_b"), col("ts").as("sb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("ni", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", col("ni").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("ni")).cast("double"))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification makes LSH ⊆ exact; recall should be high at J>=0.5
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exact.size})")
    }
  }

  test("simhash pairs rank exact dup closer than unrelated") {
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id",
      maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0)) // identical tokens
    assert(!pairs.contains((1L, 4L)))
  }

  test("identical-doc flood beyond maxBucketSize still dedups via exact path") {
    val flood = (1L to 30L).map(i =>
      (i, "exactly the same boilerplate text repeated verbatim in every copy"))
    val docs = (flood :+ ((99L, "an unrelated document about other things entirely")))
      .toDF("doc_id", "text")
    // cap of 5 << 30 copies: every LSH bucket for the flood is dropped,
    // but exact-dup pairs must still appear
    val pairs = Dedup.nearDupPairs(docs, "text", "doc_id",
      threshold = 0.5, numHashes = 64, bands = 16, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((2L to 30L).forall(i => pairs.contains((1L, i))),
      s"flood pairs missing: ${pairs.size}")
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("clusterReps propagates min id across chained pairs") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val reps = Dedup.clusterReps(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("dedupCorpus keeps one doc per near-dup cluster") {
    val kept = Dedup.dedupCorpus(corpus, "text", "doc_id",
      threshold = 0.5, numHashes = 64, bands = 16)
      .collect().map(_.getLong(0)).toSet
    // {1,2,5} exact group + 3 near-dups 1 => cluster rep 1; 4 and 6 alone
    assert(kept == Set(1L, 4L, 6L), s"got $kept")
  }

  test("clusterReps converges on a 30-link chain (pointer doubling)") {
    val n = 30L
    val ids = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // smallGraphPairs = 0 forces the ITERATIVE path — this test pins
    // the pointer-doubling loop, not the union-find fast path
    val reps = Dedup.clusterReps(ids, pairs, maxIters = 8,
      smallGraphPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-hop propagation would need 30 rounds; doubling needs ~log2(30)
    assert(reps.values.toSet == Set(1L), s"non-converged: $reps")
  }

  test("incremental dedup vs index == full-batch pairs touching the batch") {
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val thr = 0.5
    val index = Dedup.dedupIndex(existing, "text", "doc_id")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = asSet(
      Dedup.incrementalNearDups(index, batch, "text", "doc_id", thr))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    // deterministic seeded hashing => the incremental composition must
    // reproduce exactly the full-run pairs that involve a batch doc
    val full = asSet(Dedup.nearDupPairs(docs, "text", "doc_id", thr))
    val fullTouchingBatch =
      full.filter { case (a, b) => a % 5 == 0 || b % 5 == 0 }
    assert(inc == fullTouchingBatch,
      s"missing=${(fullTouchingBatch -- inc).take(5)} " +
        s"extra=${(inc -- fullTouchingBatch).take(5)}")
    assert(inc.nonEmpty)
  }

  test("incremental dedup with DRIFTED knobs hashes the batch at the " +
    "INDEX's stored params (metadata wins) — pairs equal the " +
    "consistent-knob run instead of silently vanishing") {
    val docs = graft.Engine.Tables(spark, "/root/testdata/sf0.001").documents
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val index = Dedup.dedupIndex(existing, "text", "doc_id")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val drifted = asSet(Dedup.incrementalNearDups(index, batch,
      "text", "doc_id", 0.5, numHashes = 64, shingleSize = 5,
      hasher = Dedup.MinHashFamily.Md5))
    val consistent = asSet(Dedup.incrementalNearDups(index, batch,
      "text", "doc_id", 0.5))
    assert(drifted == consistent && consistent.nonEmpty,
      s"missing=${(consistent -- drifted).take(5)}")
  }

  test("incremental VEC dedup with DRIFTED geometry knobs signs the " +
    "batch at the INDEX's stored geometry (metadata wins)") {
    val a = Array.tabulate(8)(i => (i + 1).toFloat).toSeq
    val b = Array.tabulate(8)(i => (8 - i).toFloat).toSeq
    val existing = Seq((1L, a), (9L, b)).toDF("vec_id", "embedding")
    val batch = Seq((100L, a.map(_ * 1.01f))).toDF("vec_id", "embedding")
    val index = Dedup.vecDedupIndex(existing, "embedding", "vec_id",
      dim = 8)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val drifted = asSet(Dedup.incrementalVecDups(index, batch,
      "embedding", "vec_id", 0.9, bits = 2, tables = 3, dim = 32))
    val consistent = asSet(Dedup.incrementalVecDups(index, batch,
      "embedding", "vec_id", 0.9, dim = 8))
    assert(drifted == consistent && consistent.contains((1L, 100L)),
      s"drifted=$drifted consistent=$consistent")
  }

  test("incremental dedup catches shingle-less exact dups via fingerprint") {
    val existing = Seq((1L, "tiny doc"), (2L, "another one"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "tiny doc"), (11L, "fresh content here"))
      .toDF("doc_id", "text")
    // "tiny doc" has < 3 tokens -> no shingles, null signature, no
    // LSH buckets; only the stored fingerprint can pair it
    val got = Dedup.incrementalNearDups(
      Dedup.dedupIndex(existing, "text", "doc_id"),
      batch, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 10L, 1.0)), s"got $got")
  }

  test("union-find fast path labels identically to the iterative path") {
    // chains, a star, singletons, and cross-links — exercise
    // non-trivial merge order in both strategies
    val ids = (1L to 40L).toDF("id")
    val pairs = ((1L until 12L).map(i => (i, i + 1)) ++       // chain
      Seq((20L, 25L), (25L, 21L), (21L, 24L), (30L, 12L)) ++  // star + bridge
      Seq((35L, 36L))).toDF("id_a", "id_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = asMap(Dedup.clusterReps(ids, pairs))
    val loop = asMap(Dedup.clusterReps(ids, pairs, smallGraphPairs = 0L))
    assert(fast == loop)
    // the bridge (30,12) joins the chain: 12's component min is 1
    assert(fast(30L) == 1L && fast(20L) == 20L && fast(40L) == 40L)
  }

  test("clusterReps with string ids takes the type-generic path, " +
    "rep keeps the id type") {
    // string/UUID-style ids must NOT hit the long-cast fast path:
    // "01" and "1" are distinct ids that cast to the same long. The
    // gate routes them to the iterative min/least path.
    val ids = Seq("01", "1", "2", "b", "a").toDF("id")
    val pairs = Seq(("a", "b"), ("1", "2")).toDF("id_a", "id_b")
    val got = Dedup.clusterReps(ids, pairs)
    assert(got.schema("rep").dataType ==
      org.apache.spark.sql.types.StringType)
    val m = got.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("01" -> "01", "1" -> "1", "2" -> "1",
      "a" -> "a", "b" -> "a"), s"got $m")
  }

  test("identical-vector flood beyond bucket cap still pairs via exact path") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val rows = (1L to 30L).map(i => (i, v.toSeq)) :+ ((99L, other.toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDupPairs(df, "embedding", "vec_id",
      threshold = 0.9, bits = 2, tables = 4, dim = 8, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((2L to 30L).forall(i => pairs.contains((1L, i))),
      s"flood pairs missing: ${pairs.size}")
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("null and zero-norm embeddings never pair (not even with each other)") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val zero = Array.fill(8)(0.0f)
    val rows = Seq(
      (1L, Option(v.toSeq)), (2L, Option(v.toSeq)), // genuine exact dups
      (3L, Option.empty[Seq[Float]]), (4L, Option.empty[Seq[Float]]),
      (5L, Option(zero.toSeq)), (6L, Option(zero.toSeq)))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDupPairs(df, "embedding", "vec_id",
      threshold = 0.9, bits = 2, tables = 4, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SQL grouping treats NULL = NULL: without the isNotNull guard the
    // two null rows (and the two zero-norm rows, cosine undefined)
    // would be emitted as cosine=1.0 exact dups
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("embedding LSH dup pairs ⊆ brute force, high recall at 0.35") {
    val e = graft.Engine.Tables(spark, "/root/testdata/sf0.001").embeddings
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("c", graft.functions.VectorFunctions.cosineSim(col("va"), col("vb")))
      .filter(col("c") >= 0.35).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingDupPairs(e, "embedding", "vec_id",
      threshold = 0.35)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      assert(recall >= 0.7, s"recall $recall (${lsh.size}/${brute.size})")
    }
  }

  test("semantic (k-means cell) dup pairs ⊆ brute force, high recall at 0.35") {
    val e = graft.Engine.Tables(spark, "/root/testdata/sf0.001").embeddings
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("c", graft.functions.VectorFunctions.cosineSim(col("va"), col("vb")))
      .filter(col("c") >= 0.35).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Dedup.semanticDupPairs(e, "embedding", "vec_id",
      threshold = 0.35, nlist = 4, nprobe = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification makes the result ⊆ exact; nprobe=2 recovers the
    // cross-cell boundary pairs (numpy prototype: 0.92-0.96 across
    // seeds on this fixture — near-orthogonal vectors, the
    // adversarial case for cell-local dedup)
    assert(sem.subsetOf(brute))
    if (brute.nonEmpty) {
      val recall = sem.size.toDouble / brute.size
      assert(recall >= 0.8, s"recall $recall (${sem.size}/${brute.size})")
    }
  }

  test("semantic dedup: exact-dup flood pairs O(n) via the canonical path") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val rows = (1L to 30L).map(i => (i, v.toSeq)) :+ ((99L, other.toSeq))
    val df = rows.toDF("vec_id", "embedding")
    // nlist=2 on 2 distinct reps: k-means degenerates gracefully; the
    // flood must still pair completely through the fingerprint star
    val pairs = Dedup.semanticDupPairs(df, "embedding", "vec_id",
      threshold = 0.9, nlist = 2, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((2L to 30L).forall(i => pairs.contains((1L, i))),
      s"flood pairs missing: ${pairs.size}")
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("incremental vec dedup: cross-boundary dups found, pairs verified") {
    val emb = graft.Engine.Tables(spark, "/root/testdata/sf0.001").embeddings
    val index = Dedup.vecDedupIndex(
      emb.filter(col("vec_id") % 5 =!= 0), "embedding", "vec_id")
    val inc = Dedup.incrementalVecDups(index,
      emb.filter(col("vec_id") % 5 === 0), "embedding", "vec_id",
      threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every emitted pair is exact-verified, so it must appear in the
    // brute-force >= threshold pair set, and must touch the batch
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions
          .cosineSim(col("va"), col("vb")).as("c"))
      .filter(col("c") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.subsetOf(brute), s"unverified pairs: ${inc -- brute}")
    assert(inc.forall { case (x, y) => x % 5 == 0 || y % 5 == 0 })
    // recall vs the brute-force pairs that touch the batch
    val bruteTouch = brute.filter { case (x, y) => x % 5 == 0 || y % 5 == 0 }
    val recall = (inc & bruteTouch).size.toDouble / bruteTouch.size
    assert(recall >= 0.7, s"recall $recall (${inc.size}/${bruteTouch.size})")
    // planted: an identical copy of an indexed vector must be caught
    // at cosine 1 through the stored signatures
    val donor = emb.filter(col("vec_id") === 1).head.getSeq[Float](1)
    import spark.implicits._
    val batch = Seq((100000L, donor)).toDF("vec_id", "embedding")
    val hit = Dedup.incrementalVecDups(
      Dedup.vecDedupIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "embedding", "vec_id"),
      batch, "embedding", "vec_id", threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(hit.exists { case ((x, y), c) =>
      x == 1L && y == 100000L && math.abs(c - 1.0) < 1e-9 }, s"got $hit")
  }

  test("incremental vec dedup: replayed id never emits a self-pair") {
    // daily-append replay: the batch re-ingests an id the index
    // already holds (same id, same vector). The rep-level expansion
    // must not emit the degenerate (id, id) pair, while genuine
    // cross-boundary dups of the same content still surface.
    val v = Array.tabulate(8)(i => 0.1f * (i + 1)).toSeq
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f).toSeq
    val indexed = Seq((1L, v), (2L, v), (9L, other))
      .toDF("vec_id", "embedding")
    val batch = Seq((2L, v)).toDF("vec_id", "embedding") // replay of id 2
    val got = Dedup.incrementalVecDups(
      Dedup.vecDedupIndex(indexed, "embedding", "vec_id"),
      batch, "embedding", "vec_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists { case (a, b) => a == b }, s"self-pair in $got")
    assert(got.contains((1L, 2L)), s"cross pair missing: $got")
  }

  test("incremental vec dedup: exact boundary dup survives saturated buckets") {
    // 21 DISTINCT indexed vectors sharing one direction (vi = v * k):
    // hyperplane signatures are sign-based, so all land in the same
    // bucket of every table, saturating it past maxBucketSize = 5 —
    // every LSH candidate is dropped. An exact batch copy of one of
    // them is a GUARANTEED dup and must still surface through the
    // cap-exempt vector-equality path.
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val indexed = (1L to 21L)
      .map(i => (i, v.map(x => x * (1.0f + 0.01f * i)).toSeq))
      .toDF("vec_id", "embedding")
    val batch = Seq((500L, v.map(_ * 1.03f).toSeq)) // exact copy of id 3
      .toDF("vec_id", "embedding")
    val got = Dedup.incrementalVecDups(
      Dedup.vecDedupIndex(indexed, "embedding", "vec_id"),
      batch, "embedding", "vec_id", threshold = 0.9, maxBucketSize = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.exists { case ((a, b), c) =>
      a == 3L && b == 500L && math.abs(c - 1.0) < 1e-9 },
      s"exact boundary dup dropped by bucket cap: ${got.toSeq}")
  }

  test("incremental TEXT dedup: overfull band buckets REFINE by " +
    "appended signature coordinates — planted near-dups inside a " +
    "boilerplate flood keep recall, cap-only mode loses them") {
    import spark.implicits._
    // 300 indexed docs share a 50-token boilerplate prefix with
    // 30 unique tokens each; 10 planted index docs and 10 probe docs
    // are boilerplate + a single distinct tail token. The planted
    // family is a genuine MUTUAL near-dup cluster (every planted/
    // probe pair sits at ~0.92 Jaccard; flood cross pairs at ~0.55,
    // below the 0.8 threshold), and a boilerplate-dominated doc's
    // EVERY shared band bucket is one of the crowded all-boilerplate
    // buckets (measured occupancy 9-222 here, all past cap = 8) —
    // so under cap-drop the probes find NOTHING, and under
    // refinement they must recover their cluster partners through
    // the subdivided buckets.
    val boiler = (1 to 50).map(i => s"boiler$i").mkString(" ")
    val flood = (1L to 300L).map(i =>
      (i, boiler + " " + (1 to 30).map(j => s"u${i}x$j").mkString(" ")))
    val plantedIx = (1L to 10L).map(i => (500L + i, s"$boiler tail${i}a"))
    val probes = (1L to 10L).map(i => (700L + i, s"$boiler tail${i}b"))
    val index = Dedup.dedupIndex(
      (flood ++ plantedIx).toDF("doc_id", "text"), "text", "doc_id")
      .localCheckpoint()
    val batchIdx = Dedup.dedupIndex(
      probes.toDF("doc_id", "text"), "text", "doc_id").localCheckpoint()
    def run(refineExtra: Int) = Dedup.incrementalPairs(index, batchIdx,
      threshold = 0.8, maxBucketSize = 8, refineExtra = refineExtra)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = run(Int.MaxValue)
    // recall held: every probe recovered near-dup partners, and only
    // within the planted family (flood pairs verify below threshold)
    val planted = (501L to 510L).toSet ++ (701L to 710L).toSet
    assert(refined.nonEmpty &&
      refined.forall { case (a, b) =>
        planted.contains(a) && planted.contains(b) },
      s"flood pairs leaked (verification hole): " +
        s"${refined.filterNot { case (a, b) =>
          planted.contains(a) && planted.contains(b) }}")
    // the refinement claim is about the CROSS probe (the growth
    // path); within-batch pairs go through pairsFromIndex's own cap
    // semantics on the tiny batch and are not under test here
    def cross(s: Set[(Long, Long)]) = s.filter(_._1 <= 510L)
    val crossRefined = cross(refined)
    val probesCovered = crossRefined.map(_._2)
    assert((701L to 710L).toSet.subsetOf(probesCovered),
      s"probes with zero CROSS recall: " +
        s"${(701L to 710L).toSet -- probesCovered}")
    // control: refinement disabled (pure cap) — every cross-candidate
    // bucket a boilerplate-dominated probe can share with the index
    // is crowded, so the cross probe finds NOTHING (total recall
    // loss), proving the fixture genuinely floods past the cap and
    // the appended coordinates did the work
    val capOnly = run(0)
    assert(cross(capOnly).isEmpty,
      s"cap-only cross probe unexpectedly found: ${cross(capOnly)}")
  }

  test("incremental vec dedup: overfull buckets REFINE instead of " +
    "dropping — planted near-dups inside a flooded bucket keep their " +
    "recall while a legacy (no-headroom) index loses them") {
    // DIVERSE flood: 300 distinct random vectors at bits = 2 put ~75
    // rows in every one of the 4 base buckets of every table — far
    // past maxBucketSize = 8, the exact growth state that silently
    // zeroed recall under cap-drop. Ten planted probes perturb ten
    // indexed vectors by 1e-4 (NOT identical — the exact-equality
    // bypass must not rescue them), so every planted pair lives
    // inside an overfull bucket and only survives if the probe
    // subdivides it by deeper stored-signature bits.
    val rnd = new scala.util.Random(42)
    val flood = (1L to 300L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq))
    val floodDf = flood.toDF("vec_id", "embedding")
    val probes = (1L to 10L).map { i =>
      val base = flood((i - 1).toInt * 20)._2
      (1000L + i, base.map(x => x * (1f + 1e-4f)))
    }
    val batch = probes.toDF("vec_id", "embedding")
    val expect = probes.map(p => (p._1 - 1000L - 1) * 20 + 1)
      .zip(probes.map(_._1)).toSet
    val refined = Dedup.incrementalVecDups(
      Dedup.vecDedupIndex(floodDf, "embedding", "vec_id",
        bits = 2, dim = 8),
      batch, "embedding", "vec_id", threshold = 0.99,
      bits = 2, dim = 8, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.subsetOf(refined),
      s"refinement lost planted pairs: ${expect -- refined}")
    // every emitted pair is exact-verified: subset of brute force
    val a = floodDf.unionByName(batch)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = floodDf.unionByName(batch)
      .select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions
          .cosineSim(col("va"), col("vb")).as("c"))
      .filter(col("c") >= 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined.subsetOf(brute), s"unverified: ${refined -- brute}")
    // control: an index WITHOUT refinement headroom (sigBits == bits,
    // the legacy layout) must exhibit the old failure on the same
    // data — buckets capped, every planted pair dropped. This proves
    // the fixture genuinely floods past the cap.
    val legacy = Dedup.incrementalVecDups(
      Dedup.vecDedupIndex(floodDf, "embedding", "vec_id",
        bits = 2, dim = 8, sigBits = 2),
      batch, "embedding", "vec_id", threshold = 0.99,
      bits = 2, dim = 8, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((expect & legacy).isEmpty,
      s"legacy cap-drop unexpectedly found: ${expect & legacy}")
  }

  test("incremental vec dedup: parameter drift across parquet is " +
    "RESOLVED at the entry (stored geometry wins) and the low-level " +
    "probe still fails loudly on genuinely mismatched sides") {
    val v = Array.tabulate(8)(i => 0.1f * (i + 1)).toSeq
    val other = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f).toSeq
    val path = java.nio.file.Files
      .createTempDirectory("graft-vecidx-").toString
    Dedup.vecDedupIndex(
      Seq((1L, v), (9L, other)).toDF("vec_id", "embedding"),
      "embedding", "vec_id")
      .write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path) // metadata survives parquet
    val batch = Seq((100L, v)).toDF("vec_id", "embedding")
    // entry-level drift: incrementalVecDups reads the stored geometry
    // from the index metadata and signs the batch there, so the
    // drifted knob is ignored and the planted dup still lands (the
    // streaming sinks' frozen-geometry discipline, shared)
    val drifted = Dedup.incrementalVecDups(stored, batch, "embedding",
      "vec_id", threshold = 0.9, bits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drifted.contains((1L, 100L)), s"got $drifted")
    // the defense-in-depth guard below the entry: feeding the
    // index-to-index form two sides signed under DIFFERENT geometry
    // (unresolvable — both are already derived) must fail loudly,
    // never silently return near-zero recall
    val ex = intercept[IllegalArgumentException] {
      Dedup.incrementalVecPairs(stored,
        Dedup.vecDedupIndex(batch, "embedding", "vec_id", bits = 5,
          tables = 3, dim = 8, sigBits = 8),
        threshold = 0.9, bits = 5, tables = 3, dim = 8)
    }
    assert(ex.getMessage.contains("rebuild"), ex.getMessage)
    // matching parameters probe fine and catch the planted exact dup
    val ok = Dedup.incrementalVecDups(stored, batch, "embedding",
      "vec_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ok.contains((1L, 100L)), s"got $ok")
  }

  test("span dedup surfaces planted cross-doc boilerplate, skips unique text") {
    // three docs share an 8+-token licence header; bodies are disjoint
    val header = "this file is licensed under the apache license version two"
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta content one"),
      (2L, s"$header epsilon zeta eta theta content two"),
      (3L, s"$header iota kappa lambda mu content three"),
      (4L, "entirely unrelated document with no shared spans at all here"))
      .toDF("doc_id", "text")
    val spans = Dedup.spanDups(docs, "text", "doc_id").collect()
    // the 10-token header yields 3 distinct 8-gram windows fully inside
    // it, each present in all 3 docs; nothing else repeats cross-doc
    assert(spans.length == 3, s"expected 3 shared spans, got ${spans.toSeq}")
    assert(spans.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L))
  }

  test("containmentPairs: planted excerpts all surface oriented " +
    "small->big; disjoint docs never pair") {
    // excerpt 10 = the full first half of doc 1 (containment 1.0 from
    // the excerpt side, low Jaccard); doc 4 shares nothing
    val d1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, d1),
      (4L, "wholly different tokens speaking about columnar engines " +
        "and shuffle free aggregation pipelines running fast"),
      (10L, d1.split(" ").take(10).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // excerpt: 10 tokens -> 8 distinct trigram shingles, every one in
    // doc 1 (20 tokens, 18 shingles): (10, 1, 8, 8) and nothing else
    assert(got.toSeq == Seq((10L, 1L, 8L, 8L)), s"got ${got.toSeq}")
    // the full-corpus query construction: every planted 40%-prefix
    // excerpt must pair with its source at threshold 8/10
    val fixture = graft.Engine
      .Tables(spark, "/root/testdata/sf0.001").documents
      .withColumn("ts", filter(split(col("text"), " "), x => x =!= ""))
    val planted = fixture.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        array_join(expr(
          "slice(ts, 1, greatest(1, (size(ts)*2) div 5))"), " ")
          .as("text"))
    val nPlanted = planted.count()
    val all = fixture.select(col("doc_id"), col("text"))
      .unionByName(planted)
    // orientation is by shingle-set size (an excerpt of repetitive
    // text can tie its source's distinct-shingle count), so accept
    // the planted pair in either direction
    val pairs = Dedup.containmentPairs(all, "text", "doc_id")
      .filter(col("big_id") === col("small_id") - 1000000L ||
        col("small_id") === col("big_id") - 1000000L)
      .count()
    assert(nPlanted > 0 && pairs == nPlanted,
      s"planted $nPlanted excerpts, only $pairs paired with sources")
  }

  test("containmentPairs: prefix filter is EXACT — output identical " +
    "to the naive inverted-index join") {
    // the df_prefix(g)*df(g) cut is a pigeonhole argument, not a
    // heuristic: on the fixture corpus + planted excerpts + k-way
    // floods, the filtered and naive candidate joins must verify to
    // the SAME pair set (ScaleSmoke's ladder then measures the cost
    // ratio the filter buys on exactly this operator code)
    val fixture = graft.Engine
      .Tables(spark, "/root/testdata/sf0.001").documents
      .withColumn("ts", filter(split(col("text"), " "), x => x =!= ""))
    val planted = fixture.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        array_join(expr(
          "slice(ts, 1, greatest(1, (size(ts)*2) div 5))"), " ")
          .as("text"))
    val flood = fixture.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text"))
    val all = fixture.select(col("doc_id"), col("text"))
      .unionByName(planted).unionByName(flood)
    val cols = Seq("small_id", "big_id", "n_common", "n_small")
    val fast = Dedup.containmentPairs(all, "text", "doc_id")
      .select(cols.map(col): _*)
    val naive = Dedup.containmentPairs(all, "text", "doc_id",
      prefixFilter = false).select(cols.map(col): _*)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "prefix-filtered output diverged from the naive join")
    assert(fast.count() > 0, "vacuous equality: no pairs at all")
  }

  test("jaroLinkage: canonicalized form equals the naive blocked join on a flood") {
    import org.apache.spark.sql.graft.expressions.jaro_winkler
    // planted flood: two near-dup titles x3 exact copies each, one
    // same-block stranger, one different-block title, one empty
    val rows = Seq(
      (1L, "en", "record linkage target"),
      (2L, "en", "record linkage target"),
      (3L, "en", "record linkage target"),
      (4L, "en", "record linkage targez"),
      (5L, "en", "record linkage targez"),
      (6L, "en", "record linkage targez"),
      (7L, "en", "reclusive otherness xx"),
      (8L, "en", "zz different block yy"),
      (9L, "en", ""), (10L, "en", ""),
      (11L, "fr", "record linkage target")) // other lang: never pairs
      .toDF("id", "lang", "title")
    val got = Dedup.jaroLinkage(rows, "id", "lang", "title",
      threshold = 0.93)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // naive reference: blocked member-pair join, same semantics
    val f = rows.withColumn("blk", substring(col("title"), 1, 2))
    val naive = f.select(col("id").as("id_a"), col("lang"), col("blk"),
      col("title").as("t_a"))
      .join(f.select(col("id").as("id_b"), col("lang"), col("blk"),
        col("title").as("t_b")), Seq("lang", "blk"))
      .where(col("id_b") > col("id_a"))
      .select(col("id_a"), col("id_b"),
        jaro_winkler(col("t_a"), col("t_b")).as("sim"))
      .where(col("sim") >= 0.93)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == naive, s"got $got\nwant $naive")
    // shape sanity: the two flood groups star internally (3 pairs
    // each at exactly 1.0) and cross-pair 3x3 at the kernel value;
    // empty titles and the cross-lang copy never appear
    assert(got.count(_._3 == 1.0) == 6)
    assert(got.size == 15)
    assert(!got.exists(p => p._1 >= 9L || p._2 >= 9L))
  }
}
